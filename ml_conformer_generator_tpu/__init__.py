"""ml_conformer_generator_tpu — TPU-native shape-constrained molecule generation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``Membrizard/ml_conformer_generator``: conditional E(3)-equivariant diffusion
(EGNN denoiser, moment-of-inertia shape conditioning), dense-GCN bond-order
prediction, fragment inpainting / inertial fragment matching, and a host-side
chemistry pipeline (perception, sanitisation, standardisation, evaluation).
"""

__version__ = "0.1.0"

from .config import (ATOM_DECODER, CONTEXT_NORMS, DIMENSION, MAX_N_NODES,
                     MIN_N_NODES, NUM_BOND_TYPES, PERMITTED_ELEMENTS,
                     AdjMatSeerConfig, DiffusionConfig, EGNNConfig,
                     GeneratorConfig)

__all__ = [
    "ATOM_DECODER", "CONTEXT_NORMS", "DIMENSION", "MAX_N_NODES", "MIN_N_NODES",
    "NUM_BOND_TYPES", "PERMITTED_ELEMENTS", "AdjMatSeerConfig",
    "DiffusionConfig", "EGNNConfig", "GeneratorConfig", "MLConformerGenerator",
    "MLConformerGeneratorONNX",
    "evaluate_samples", "run_evaluation", "ffd", "fcd",
    "principal_inertia_components", "enable_compile_cache", "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import ml_conformer_generator_tpu` light; the full
    # pipeline (chem + models) loads on first use.
    if name == "MLConformerGenerator":
        from .generator import MLConformerGenerator
        return MLConformerGenerator
    if name == "MLConformerGeneratorONNX":
        from .generator import MLConformerGeneratorONNX
        return MLConformerGeneratorONNX
    if name == "evaluate_samples":
        from .eval.pipeline import evaluate_samples
        return evaluate_samples
    if name == "run_evaluation":
        from .eval.harness import run_evaluation
        return run_evaluation
    if name == "ffd":
        from .eval.frechet import ffd
        return ffd
    if name == "fcd":
        from .eval.fcd import fcd
        return fcd
    if name == "principal_inertia_components":
        from .chem.stl import principal_inertia_components
        return principal_inertia_components
    if name == "enable_compile_cache":
        from .utils.cache import enable_compile_cache
        return enable_compile_cache
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
