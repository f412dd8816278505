"""STL mesh input: parse + principal moments of inertia for shape conditioning.

The reference's demo workflow 4 (``python_api_demo.ipynb``; README.md:162-175)
generates molecules for an *arbitrary* shape by loading a watertight STL mesh
with trimesh and passing ``mesh.principal_inertia_components`` as
``reference_context`` (plus a target ``n_atoms``). This module provides that
capability without trimesh: a binary/ASCII STL parser and exact solid mass
properties via signed-tetrahedron decomposition (divergence theorem), matching
trimesh's density=1 convention.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = ["read_stl", "principal_inertia_components", "mesh_mass_properties"]


def read_stl(path: str) -> np.ndarray:
    """Read an STL file -> (n_triangles, 3, 3) float64 vertex array.

    Handles both binary and ASCII variants (sniffed by record arithmetic, not
    just the 'solid' prefix, since binary files may start with it too).
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) >= 84:
        (n_tri,) = struct.unpack_from("<I", data, 80)
        if len(data) == 84 + 50 * n_tri:
            tris = np.zeros((n_tri, 3, 3), dtype=np.float64)
            off = 84
            for t in range(n_tri):
                vals = struct.unpack_from("<12f", data, off)
                tris[t] = np.asarray(vals[3:12]).reshape(3, 3)
                off += 50
            return tris
    # ASCII
    text = data.decode("ascii", errors="replace")
    verts = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) == 4 and parts[0].lower() == "vertex":
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    arr = np.asarray(verts, dtype=np.float64)
    if arr.size == 0 or arr.shape[0] % 3:
        raise ValueError(f"Could not parse STL file {path!r}")
    return arr.reshape(-1, 3, 3)


def mesh_mass_properties(triangles: np.ndarray
                         ) -> Tuple[float, np.ndarray, np.ndarray]:
    """(volume, center_of_mass, inertia_tensor_about_com) at density 1.

    Signed-tetrahedron decomposition against the origin: each triangle
    (a, b, c) contributes tetra (0, a, b, c) with signed volume det/6; second
    moments use the exact tetrahedron integral
    ``int x x^T dV = (V/20) (sum_i p_i p_i^T + s s^T)`` with ``s = sum_i p_i``
    (origin vertex contributes zero). Requires a watertight, consistently
    oriented mesh — the same contract trimesh's mass properties assume.
    """
    tris = np.asarray(triangles, dtype=np.float64)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    det = np.einsum("ij,ij->i", a, np.cross(b, c))      # 6 * signed volume
    vol6 = det
    volume = vol6.sum() / 6.0
    if abs(volume) < 1e-12:
        raise ValueError("Mesh encloses no volume (not watertight?)")

    centroid_t = (a + b + c) / 4.0                       # tetra centroid
    com = (vol6[:, None] * centroid_t).sum(axis=0) / (6.0 * volume)

    # Second moment about the origin, accumulated per tetra.
    s = a + b + c
    ppt = (np.einsum("ni,nj->nij", a, a) + np.einsum("ni,nj->nij", b, b)
           + np.einsum("ni,nj->nij", c, c) + np.einsum("ni,nj->nij", s, s))
    second = ((vol6 / 6.0)[:, None, None] * ppt / 20.0).sum(axis=0)

    # Shift to CoM, convert covariance -> inertia tensor.
    second_com = second - volume * np.outer(com, com)
    inertia = np.trace(second_com) * np.eye(3) - second_com
    if volume < 0:      # inward-oriented mesh: flip sign convention
        volume, inertia = -volume, -inertia
    return float(volume), com, inertia


def principal_inertia_components(path_or_triangles) -> np.ndarray:
    """Ascending principal moments of inertia of a watertight mesh.

    Drop-in for ``trimesh.Trimesh.principal_inertia_components`` as used by
    the reference demo to build ``reference_context``.
    """
    tris = (read_stl(path_or_triangles)
            if isinstance(path_or_triangles, str) else path_or_triangles)
    _, _, inertia = mesh_mass_properties(tris)
    return np.sort(np.linalg.eigvalsh(inertia))
