"""Framework-level configuration constants and frozen model configs.

Mirrors the reference constants (``/root/reference/src/mlconfgen/utils/config.py:1-32``)
so that checkpoints and downstream metrics are directly comparable, while the
model/hyper-parameter surface is expressed as frozen dataclasses suited to a
functional JAX codebase (hashable -> usable as static jit args).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Data-layout constants (parity with reference utils/config.py)
# ---------------------------------------------------------------------------

#: Maximal padded graph size (heavy atoms) supported by the bond predictor.
DIMENSION = 42

#: Bond-type channels: 0 = no bond, 1 = single, 2 = double, 3 = triple, 4 = aromatic.
NUM_BOND_TYPES = 5

#: Normalisation (mean / median-absolute-deviation) of the three principal
#: moment-of-inertia components used as the conditioning context.
CONTEXT_NORMS = {
    "mean": (105.0766, 473.1938, 537.4675),
    "mad": (52.0409, 219.7475, 232.9718),
}

#: Integer class id -> element symbol for the 8 generated heavy-atom types.
ATOM_DECODER = {
    0: "C",
    1: "N",
    2: "O",
    3: "F",
    4: "P",
    5: "S",
    6: "Cl",
    7: "Br",
}

#: Atomic numbers the generator can emit / the bond predictor understands.
PERMITTED_ELEMENTS = (6, 7, 8, 9, 15, 16, 17, 35)

#: Element symbol -> dense class id (inverse of ATOM_DECODER).
ATOM_ENCODER = {v: k for k, v in ATOM_DECODER.items()}

#: Atomic number -> dense class id, sorted by atomic number (parity with
#: reference ``molgraph.elements_decoder``).
ELEMENTS_TO_CLASS = {z: i for i, z in enumerate(sorted(PERMITTED_ELEMENTS))}

MIN_N_NODES = 15
MAX_N_NODES = 39

#: Number of generated atom classes (== len(ATOM_DECODER)); the EDM feature dim.
NUM_ATOM_CLASSES = 8


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EGNNConfig:
    """Config of the EGNN denoiser backbone.

    Matches the reference hyper-parameters (``egnn.py:448-465``): 9 equivariant
    blocks, width 420, 8 atom-type features + 1 time + 3 context channels.
    """

    in_node_nf: int = 9          # atom one-hot (8) + time (1)
    context_node_nf: int = 3     # principal MOI components
    hidden_nf: int = 420
    n_blocks: int = 9
    n_dims: int = 3
    normalization_factor: float = 100.0
    edge_feat_nf: int = 2        # [current d^2, initial d^2]
    #: MXU compute precision for the edge/node MLPs. "bfloat16" runs the hot
    #: matmuls on the MXU at full rate (f32 accumulation) while geometry
    #: (coordinates, distances, CoM projections) stays float32.
    compute_dtype: str = "float32"
    #: Fused Pallas edge-MLP kernel (ops/gcl_kernel.py): "auto" enables it on
    #: TPU backends only, "on" forces it (interpret-mode off-TPU), "off"
    #: always uses the pure-XLA dense path. Default "off": on v5e the XLA
    #: dense path (fused dot+silu epilogues) still edges out the hand kernel
    #: end-to-end (kernel-only 2.35 vs 2.40 ms/GCL-pass at B=128, but the
    #: kernel path pays extra glue around the custom call) — measurements in
    #: ops/gcl_kernel.py.
    use_pallas: str = "off"
    #: Rematerialise each block in the backward pass (jax.checkpoint on the
    #: scan body). Off for inference (no backward); training at production
    #: width REQUIRES it on one chip: without remat the backward stores every
    #: block's (B, N, N, hidden) edge activations — 9 x ~0.9 GB at B=32 —
    #: and OOMs 16 GB HBM; with remat only the per-block (h, x) carries are
    #: saved and the edge MLPs are recomputed (~1.3x training FLOPs).
    remat: bool = False

    @property
    def total_node_nf(self) -> int:
        return self.in_node_nf + self.context_node_nf


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Config of the EDM reverse sampler (``equivariant_diffusion.py:137-174``)."""

    timesteps: int = 100
    noise_precision: float = 1e-5
    in_node_nf: int = NUM_ATOM_CLASSES
    n_dims: int = 3
    norm_values: Tuple[float, float] = (1.0, 9.0)
    schedule_power: int = 2


@dataclasses.dataclass(frozen=True)
class AdjMatSeerConfig:
    """Config of the dense-GCN bond-order predictor (``adj_mat_seer.py:60-102``)."""

    dimension: int = DIMENSION
    n_hidden: int = 2048
    embedding_dim: int = 64
    num_embeddings: int = 36
    num_bond_types: int = NUM_BOND_TYPES


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Top-level pipeline config (reference ``conformer_generator.py:25-123``)."""

    diffusion_steps: int = 100
    dimension: int = DIMENSION
    num_bond_types: int = NUM_BOND_TYPES
    min_n_nodes: int = MIN_N_NODES
    max_n_nodes: int = MAX_N_NODES
    egnn: EGNNConfig = dataclasses.field(default_factory=EGNNConfig)
    adj_mat_seer: AdjMatSeerConfig = dataclasses.field(default_factory=AdjMatSeerConfig)

    def diffusion(self) -> DiffusionConfig:
        return DiffusionConfig(timesteps=self.diffusion_steps)
