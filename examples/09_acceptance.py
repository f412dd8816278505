"""Workflow 9: weights acceptance — runnable the day trained weights land.

Given the reference's released checkpoints (torch ``.pt``, ONNX ``.onnx`` or
native ``.npz`` — the loader dispatches on suffix), replays the reference's
evaluation protocol (``/root/reference/research_scripts/evaluation.py:45-268``:
N samples per reference, variance 2, 100 diffusion steps) over a reference
set (an SDF like ``1000_ccdc_validation_set.sdf``, or the demo conformers by
default) and asserts the headline metrics land within tolerance of
BASELINE.md's published numbers:

* validity (valid molecules after standardisation)  ~ 48%
* average shape Tanimoto                            ~ 53.3%
* average chemical Tanimoto                         ~ 10.9%
* uniqueness within the generated set               ~ 99.9%

Exit code 0 = accepted; 1 = one or more metrics out of tolerance.

Example::

    python examples/09_acceptance.py \
        --edm-weights edm_moi_chembl_15_39.pt \
        --adj-weights adj_mat_seer_chembl_15_39.pt \
        --references 1000_ccdc_validation_set.sdf --n-references 50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BASELINE = {
    "validity": 0.48,            # README.md:115
    "avg_shape_tanimoto": 0.5332,   # README.md:111
    "avg_chemical_tanimoto": 0.1087,  # README.md:113
    "uniqueness": 0.9994,        # README.md:116
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edm-weights", required=True,
                    help=".pt / .onnx / .npz EDM checkpoint")
    ap.add_argument("--adj-weights", required=True,
                    help=".pt / .onnx / .npz AdjMatSeer checkpoint")
    ap.add_argument("--references", default=None,
                    help="SDF of reference conformers (default: the "
                         "reference repo's demo .mol files)")
    ap.add_argument("--n-references", type=int, default=20)
    ap.add_argument("--n-samples", type=int, default=100)
    ap.add_argument("--variance", type=int, default=2)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--tol-validity", type=float, default=0.10,
                    help="absolute tolerance on the validity fraction")
    ap.add_argument("--tol-shape", type=float, default=0.08)
    ap.add_argument("--tol-chem", type=float, default=0.05)
    ap.add_argument("--min-uniqueness", type=float, default=0.95)
    ap.add_argument("--report", default=None, help="write the full text "
                    "report here")
    args = ap.parse_args()

    from ml_conformer_generator_tpu.chem import read_mol_file, read_sdf
    from ml_conformer_generator_tpu.eval.harness import (format_report,
                                                         run_evaluation)
    from ml_conformer_generator_tpu.generator import MLConformerGenerator

    if args.references:
        with open(args.references) as f:
            refs = read_sdf(f.read())
    else:
        demo = "/root/reference/assets/demo_files"
        refs = [read_mol_file(os.path.join(demo, n))
                for n in ("ceyyag.mol", "crown_6.mol", "yibfeu.mol")]
    refs = [r.remove_hs() for r in refs]
    refs = [r for r in refs if 15 <= r.num_atoms <= 39][: args.n_references]
    if not refs:
        print("no usable references (need 15-39 heavy atoms)")
        return 1

    generator = MLConformerGenerator(
        diffusion_steps=args.steps,
        edm_weights=args.edm_weights,
        adj_mat_seer_weights=args.adj_weights)

    rep = run_evaluation(generator, refs, n_samples=args.n_samples,
                         variance=args.variance, progress=True)
    text = format_report(rep)
    print(text)
    if args.report:
        with open(args.report, "w") as f:
            f.write(text)

    validity = rep.n_valid / max(rep.n_requested, 1)
    uniqueness = rep.unique_within_batch / max(rep.n_valid, 1)
    checks = [
        ("validity", validity, BASELINE["validity"], args.tol_validity),
        ("avg_shape_tanimoto", rep.avg_shape_tanimoto,
         BASELINE["avg_shape_tanimoto"], args.tol_shape),
        ("avg_chemical_tanimoto", rep.avg_chemical_tanimoto,
         BASELINE["avg_chemical_tanimoto"], args.tol_chem),
    ]
    ok = True
    for name, got, want, tol in checks:
        status = "OK" if abs(got - want) <= tol else "FAIL"
        ok &= status == "OK"
        print(f"[{status}] {name}: {got:.4f} (baseline {want:.4f} "
              f"+/- {tol:.3f})")
    status = "OK" if uniqueness >= args.min_uniqueness else "FAIL"
    ok &= status == "OK"
    print(f"[{status}] uniqueness: {uniqueness:.4f} "
          f"(>= {args.min_uniqueness:.3f})")
    print("ACCEPTED" if ok else "REJECTED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
