"""Workflow 1: shape-matched generation from a reference conformer.

Equivalent of the reference's first demo workflow (python_api_demo.ipynb;
README.md:43-62): load a conformer, generate n_samples molecules whose shape
matches it, score them, write an SDF sorted by shape Tanimoto.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.chem import read_mol_file, write_sdf
from ml_conformer_generator_tpu.eval import evaluate_samples
from ml_conformer_generator_tpu.generator import MLConformerGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference",
                    default="/root/reference/assets/demo_files/ceyyag.mol")
    ap.add_argument("--n-samples", type=int, default=20)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--variance", type=int, default=2)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    ap.add_argument("--out", default="samples.sdf")
    args = ap.parse_args()

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    reference = read_mol_file(args.reference)

    samples = generator.generate_conformers(
        reference_conformer=reference, n_samples=args.n_samples,
        variance=args.variance)
    print(f"{len(samples)}/{args.n_samples} valid after standardisation")

    _, scored = evaluate_samples(reference, samples)
    scored.sort(key=lambda s: s["shape_tanimoto"], reverse=True)
    for i, s in enumerate(scored[:5]):
        print(f"#{i + 1}: shape {s['shape_tanimoto']:.3f} "
              f"chem {s['chemical_tanimoto']:.3f}")
    if samples:
        with open(args.out, "w") as f:
            f.write(write_sdf(samples))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
