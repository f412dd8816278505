"""Pod-scale virtual screening with the DP-sharded driver.

The framework-native version of the reference's evaluation workload
(research_scripts/evaluation.py: 100 samples x N references): the sample
batch shards across every chip of the mesh, host chemistry overlaps device
compute, and the run emits the reference-format statistics report.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.chem import read_mol_file, read_sdf
from ml_conformer_generator_tpu.eval.harness import format_report
from ml_conformer_generator_tpu.generator import MLConformerGenerator
from ml_conformer_generator_tpu.parallel.screening import ScreeningDriver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("references", nargs="+",
                    help=".mol/.sdf files of reference conformers")
    ap.add_argument("--n-samples", type=int, default=100)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--variance", type=int, default=2)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-weights", default=None)
    ap.add_argument("--report", default="screening_report.txt")
    args = ap.parse_args()

    refs = []
    for path in args.references:
        if path.endswith(".sdf"):
            with open(path) as f:
                refs.extend(read_sdf(f.read()))
        else:
            refs.append(read_mol_file(path))

    generator = MLConformerGenerator(
        diffusion_steps=args.steps, edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)
    driver = ScreeningDriver(generator)
    report = driver.screen(refs, n_samples=args.n_samples,
                           variance=args.variance, progress=True)

    text = format_report(report)
    print(text)
    with open(args.report, "w") as f:
        f.write(text + "\n")
    print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
