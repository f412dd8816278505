"""Workflow 3: inertial fragment matching (IFM).

Equivalent of the reference demo's IFM workflow (python_api_demo.ipynb):
the generated complement is sampled in its own principal frame with a
MOI-difference context, rotated back, and merged with the fixed fragment by
partial re-diffusion (reference conformer_generator.py:171-241,
equivariant_diffusion.py:515-607).
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
    ap.add_argument("--diffusion-level", type=int, default=50)
    ap.add_argument("--blend-power", type=int, default=3)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    ap.add_argument("--out", default="ifm.sdf")
    args = ap.parse_args()

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    reference = read_mol_file(args.reference)
    fragment = read_mol_file(args.fragment)

    samples = generator.generate_conformers(
        reference_conformer=reference, n_samples=args.n_samples,
        fixed_fragment=fragment, inertial_fragment_matching=True,
        ifm_diffusion_level=args.diffusion_level,
        blend_power=args.blend_power)
    print(f"{len(samples)}/{args.n_samples} valid")
    if samples:
        with open(args.out, "w") as f:
            f.write(write_sdf(samples))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
