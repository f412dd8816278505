"""Workflow 2: simple fragment inpainting.

Equivalent of the reference demo's inpainting workflow
(python_api_demo.ipynb: inertial_fragment_matching=False, resample_steps=2):
the fixed fragment is forward-diffused and blended into the sample at every
denoising step (reference equivariant_diffusion.py:423-513).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.chem import read_mol_file, write_sdf
from ml_conformer_generator_tpu.generator import MLConformerGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference",
                    default="/root/reference/assets/demo_files/yibfeu.mol")
    ap.add_argument("--fragment",
                    default="/root/reference/assets/demo_files/frag_yibfeu.mol")
    ap.add_argument("--n-samples", type=int, default=10)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--resample-steps", type=int, default=2)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    ap.add_argument("--out", default="inpainted.sdf")
    args = ap.parse_args()

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    reference = read_mol_file(args.reference)
    fragment = read_mol_file(args.fragment)

    samples = generator.generate_conformers(
        reference_conformer=reference, n_samples=args.n_samples,
        fixed_fragment=fragment, inertial_fragment_matching=False,
        resample_steps=args.resample_steps)
    print(f"{len(samples)}/{args.n_samples} valid")
    if samples:
        with open(args.out, "w") as f:
            f.write(write_sdf(samples))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
