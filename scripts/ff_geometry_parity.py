#!/usr/bin/env python
"""Quantitative geometry parity for the batched force field (PARITY.md).

The reference's standardizer runs constrained MMFF94 per molecule
(``/root/reference/src/mlconfgen/utils/standardizer.py:62-80``); this
framework's device force field (``chem/forcefield.py``) claims the same
*local cleanup* role. This script turns that claim into numbers: perturb the
experimental demo conformers with Gaussian coordinate noise, relax, and
measure how much of the experimental geometry the relaxation restores —

* bond-length RMS deviation vs the experimental lengths (A),
* bond-angle RMS deviation vs the experimental angles (deg),
* aromatic-ring planarity (RMS out-of-plane distance to the best-fit plane,
  A — absolute, since the experimental rings are already flat).

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
           scripts/ff_geometry_parity.py [--sigma 0.15] [--steps 300]
Prints a markdown table (pasted into PARITY.md) plus one JSON line.
"""

import argparse
import glob
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from ml_conformer_generator_tpu.chem.forcefield import optimize_geometry  # noqa: E402
from ml_conformer_generator_tpu.chem.io import read_mol_file  # noqa: E402
from ml_conformer_generator_tpu.chem.perception import find_rings  # noqa: E402
from ml_conformer_generator_tpu.chem.sanitize import aromatize  # noqa: E402


def bond_length_list(mol) -> np.ndarray:
    c = mol.coords
    return np.array([np.linalg.norm(c[i] - c[j]) for i, j, _ in mol.bonds])


def angle_list(mol) -> np.ndarray:
    """All (i, center, j) angles in degrees, fixed neighbour-pair order."""
    c = mol.coords
    neigh = [[] for _ in range(mol.num_atoms)]
    for i, j, _ in mol.bonds:
        neigh[i].append(j)
        neigh[j].append(i)
    out = []
    for center in range(mol.num_atoms):
        nb = sorted(neigh[center])
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                v1 = c[nb[a]] - c[center]
                v2 = c[nb[b]] - c[center]
                cos = np.dot(v1, v2) / (np.linalg.norm(v1)
                                        * np.linalg.norm(v2) + 1e-12)
                out.append(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
    return np.array(out)


def aromatic_rings(mol):
    arom = aromatize(mol)
    arom_bonds = {(min(i, j), max(i, j))
                  for i, j, o in arom.bonds if o == 4}
    rings = []
    for ring in find_rings(arom, max_size=7):
        k = len(ring)
        edges = [(min(ring[t], ring[(t + 1) % k]),
                  max(ring[t], ring[(t + 1) % k])) for t in range(k)]
        if all(e in arom_bonds for e in edges):
            rings.append(ring)
    return rings


def planarity_rms(mol, rings) -> float:
    """RMS out-of-plane distance of aromatic-ring atoms (best-fit plane)."""
    if not rings:
        return float("nan")
    devs = []
    for ring in rings:
        pts = mol.coords[np.array(ring)]
        pts = pts - pts.mean(axis=0)
        # normal = least singular vector
        _, _, vt = np.linalg.svd(pts, full_matrices=False)
        devs.extend(pts @ vt[-1])
    return float(np.sqrt(np.mean(np.square(devs))))


def measure(mols, sigma: float, steps: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    perturbed = []
    for m in mols:
        p = m.copy()
        p.coords = p.coords + rng.normal(scale=sigma, size=p.coords.shape)
        perturbed.append(p)
    relaxed = optimize_geometry(perturbed, n_steps=steps)

    rows = []
    for m, p, r in zip(mols, perturbed, relaxed):
        b0 = bond_length_list(m)
        a0 = angle_list(m)
        rings = aromatic_rings(m)

        def rms(x, y):
            return float(np.sqrt(np.mean(np.square(x - y))))

        rows.append({
            "name": m.name or "?",
            "n_atoms": m.num_atoms,
            "bond_rms_perturbed_A": rms(bond_length_list(p), b0),
            "bond_rms_relaxed_A": rms(bond_length_list(r), b0),
            "angle_rms_perturbed_deg": rms(angle_list(p), a0),
            "angle_rms_relaxed_deg": rms(angle_list(r), a0),
            "planarity_exp_A": planarity_rms(m, rings),
            "planarity_perturbed_A": planarity_rms(p, rings),
            "planarity_relaxed_A": planarity_rms(r, rings),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=0.15,
                    help="coordinate noise (A) modelling diffusion-output "
                         "imperfection")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    mols = []
    for f in sorted(glob.glob("/root/reference/assets/demo_files/*.mol")):
        m = read_mol_file(f).remove_hs()
        m.name = f.split("/")[-1].replace(".mol", "")
        if m.num_bonds:
            mols.append(m)
    rows = measure(mols, args.sigma, args.steps)

    print(f"| molecule | atoms | bond RMS ptb->rlx (A) | "
          f"angle RMS ptb->rlx (deg) | ring planarity exp/ptb/rlx (A) |")
    print("|---|---|---|---|---|")
    for r in rows:
        pl = ("-" if np.isnan(r["planarity_exp_A"]) else
              f"{r['planarity_exp_A']:.3f} / {r['planarity_perturbed_A']:.3f}"
              f" / {r['planarity_relaxed_A']:.3f}")
        print(f"| {r['name']} | {r['n_atoms']} "
              f"| {r['bond_rms_perturbed_A']:.3f} -> "
              f"{r['bond_rms_relaxed_A']:.3f} "
              f"| {r['angle_rms_perturbed_deg']:.1f} -> "
              f"{r['angle_rms_relaxed_deg']:.1f} | {pl} |")
    print(json.dumps({"sigma": args.sigma, "steps": args.steps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
