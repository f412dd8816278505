#!/usr/bin/env python
"""Production-path TPU smoke: full-width MLConformerGenerator on the chip.

Drives the real public API (``generate_conformers``) — not the bare sampler —
at production size (420x9 EGNN, 2048-wide AdjMatSeer, 100 steps) and prints
the per-stage latency split (``generator.last_metrics``). With random weights
0 valid molecules is the expected outcome (standardization filters garbage);
this checks the full device+host pipeline mechanics and measures the
device/host overlap headroom, mirroring the reference's working point
(``research_scripts/evaluation.py``: 100 samples/request, variance 2).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    from ml_conformer_generator_tpu.chem import read_mol_file
    from ml_conformer_generator_tpu.generator import MLConformerGenerator

    print("backend:", jax.default_backend(), file=sys.stderr)
    gen = MLConformerGenerator(diffusion_steps=100, seed=0)

    ref = read_mol_file("/root/reference/assets/demo_files/ceyyag.mol")
    # Warmup request compiles the bucket program.
    gen.generate_conformers(reference_conformer=ref, n_samples=128,
                            variance=2, optimise_geometry=False)
    print("warmup:", json.dumps(gen.last_metrics), file=sys.stderr)

    t0 = time.perf_counter()
    mols = gen.generate_conformers(reference_conformer=ref, n_samples=128,
                                   variance=2, optimise_geometry=False)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "request_samples_per_s": round(128 / dt, 2),
        "n_valid": len(mols),
        "stages": gen.last_metrics,
    }))


if __name__ == "__main__":
    main()
