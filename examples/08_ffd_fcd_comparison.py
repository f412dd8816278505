"""Distribution comparison between molecule sets: FFD + FCD cross-table.

Equivalent of the reference's ``research_scripts/ffd_fcd/ffd_comparison.py``
and ``fcd_chemnet_comparison.py``: computes the Fréchet Fingerprint Distance
(Morgan radius-2, 2048-bit) and the Fréchet ChemNet Distance (fixed
random-weight graph encoder) between every pair of input SDF sets and writes
a CSV cross-table.
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ml_conformer_generator_tpu.chem import read_sdf, read_smiles_file
from ml_conformer_generator_tpu.eval.fcd import (chemnet_embeddings,
                                                 init_chemnet_params)
from ml_conformer_generator_tpu.eval.frechet import (fingerprint_matrix,
                                                     frechet_distance)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sets", nargs="+",
                    help="molecule sets: .sdf files or SMILES corpora "
                         "(.smi/.txt, one SMILES per line — the format of "
                         "the reference's ChEMBL/PubChem/ZINC comparison "
                         "sets, research_scripts/ffd_fcd/*)")
    ap.add_argument("--metric", choices=["ffd", "fcd", "both"],
                    default="both")
    ap.add_argument("--out", default="frechet_comparison.csv")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap molecules per set (0 = all)")
    args = ap.parse_args()

    names, mols = [], []
    for path in args.sets:
        if path.endswith((".smi", ".smiles", ".txt", ".csv")):
            ms = read_smiles_file(path, limit=args.limit or None)
        else:
            with open(path) as f:
                ms = read_sdf(f.read())
        if args.limit:
            ms = ms[: args.limit]
        names.append(os.path.splitext(os.path.basename(path))[0])
        mols.append(ms)
        print(f"{names[-1]}: {len(ms)} molecules")

    embeddings = {}
    if args.metric in ("ffd", "both"):
        embeddings["ffd"] = [fingerprint_matrix(ms) for ms in mols]
    if args.metric in ("fcd", "both"):
        params = init_chemnet_params()
        embeddings["fcd"] = [chemnet_embeddings(ms, params) for ms in mols]

    rows = []
    for metric, embs in embeddings.items():
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = frechet_distance(embs[i], embs[j])
                rows.append({"metric": metric, "set1": names[i],
                             "set2": names[j], "distance": round(d, 6)})
                print(f"{metric.upper()} {names[i]} vs {names[j]}: {d:.4f}")

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["metric", "set1", "set2",
                                          "distance"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
