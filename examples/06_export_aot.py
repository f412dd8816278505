"""AOT export of the compiled units (StableHLO).

The framework's analog of the reference's ONNX export
(onnx_export/onnx_export.py): serialises the full T-step sampler, the
single-step denoiser, and the bond predictor for deployment without the
model code.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.export import export_generator_artifacts
from ml_conformer_generator_tpu.generator import MLConformerGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="exported")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    args = ap.parse_args()

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    paths = export_generator_artifacts(generator, args.out_dir,
                                       batch=args.batch)
    for name, path in paths.items():
        print(f"{name}: {path}")


if __name__ == "__main__":
    main()
