"""Visual check: overlay a generated molecule on a pocket mesh.

Equivalent of the reference's ``research_scripts/visualize_mol_and_stl.py``
(pyvista/trimesh overlay, PCA-aligned ``align_to_principal_axes`` :7-26) using
matplotlib 3D: both the mesh and the molecule are rotated into their
principal axes and rendered together; writes a PNG.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from ml_conformer_generator_tpu.chem import read_mol_file
from ml_conformer_generator_tpu.chem.stl import read_stl


def align_to_principal_axes(points: np.ndarray) -> np.ndarray:
    """Center + rotate points into their PCA frame (reference :7-26)."""
    centered = points - points.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt.T


CPK = {6: "#606a76", 7: "#3050f8", 8: "#ff0d0d", 9: "#90e050", 15: "#ff8000",
       16: "#ffff30", 17: "#1ff01f", 35: "#a62929", 1: "#e8e8e8"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stl",
                    default="/root/reference/assets/demo_files/6q8k_pocket.stl")
    ap.add_argument("--mol",
                    default="/root/reference/assets/demo_files/ceyyag.mol")
    ap.add_argument("--out", default="mol_and_stl.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    tris = read_stl(args.stl)
    verts = tris.reshape(-1, 3)
    aligned = align_to_principal_axes(verts).reshape(tris.shape)

    mol = read_mol_file(args.mol).remove_hs()
    coords = align_to_principal_axes(mol.coords)

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.add_collection3d(Poly3DCollection(
        aligned, alpha=0.12, facecolor="#4da3ff", edgecolor="#2a4a6a",
        linewidths=0.1))
    colors = [CPK.get(int(z), "#909090") for z in mol.atomic_nums]
    ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], c=colors, s=120,
               depthshade=True, edgecolors="k", linewidths=0.5)
    for i, j, _ in mol.bonds:
        ax.plot(*zip(coords[i], coords[j]), color="#404a56", linewidth=2)

    lim = np.abs(aligned).max()
    for setter in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        setter(-lim, lim)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
