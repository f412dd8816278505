"""Workflow 4: generation into an arbitrary shape given as an STL mesh.

Equivalent of the reference demo's mesh workflow (python_api_demo.ipynb;
README.md:162-175, which uses trimesh.principal_inertia_components): the
watertight mesh's principal moments of inertia become the conditioning
context; n_atoms sets the target molecule size.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.chem import write_sdf
from ml_conformer_generator_tpu.chem.stl import principal_inertia_components
from ml_conformer_generator_tpu.generator import MLConformerGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stl",
                    default="/root/reference/assets/demo_files/6q8k_pocket.stl")
    ap.add_argument("--n-atoms", type=int, default=32)
    ap.add_argument("--n-samples", type=int, default=10)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--scale", type=float, default=0.01,
                    help="context scale factor (mesh units -> context units)")
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    ap.add_argument("--out", default="shape_fill.sdf")
    args = ap.parse_args()

    context = principal_inertia_components(args.stl) * args.scale
    print("reference context (principal MOI):", context)

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    samples = generator.generate_conformers(
        reference_context=context, n_atoms=args.n_atoms,
        n_samples=args.n_samples)
    print(f"{len(samples)}/{args.n_samples} valid")
    if samples:
        with open(args.out, "w") as f:
            f.write(write_sdf(samples))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
