"""Tests: FCD random-encoder metric (eval/fcd.py) and STL mesh input
(chem/stl.py; reference workflow: python_api_demo.ipynb / README.md:162-175)."""

import struct

import numpy as np
import pytest

from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.chem.stl import (mesh_mass_properties,
                                                 principal_inertia_components,
                                                 read_stl)
from ml_conformer_generator_tpu.eval.fcd import (chemnet_embeddings, fcd,
                                                 init_chemnet_params)


def _chain(z_seq, rng):
    n = len(z_seq)
    coords = np.cumsum(rng.standard_normal((n, 3)) * 0.5, axis=0)
    bonds = [(i, i + 1, 1) for i in range(n - 1)]
    return Molecule(np.asarray(z_seq), coords, bonds)


def test_chemnet_embeddings_deterministic(rng):
    mols = [_chain([6, 6, 8, 7], rng) for _ in range(3)]
    e1 = chemnet_embeddings(mols, init_chemnet_params(0))
    e2 = chemnet_embeddings(mols, init_chemnet_params(0))
    assert e1.shape == (3, 512)
    np.testing.assert_array_equal(e1, e2)


def test_fcd_separates_distributions(rng):
    carbon = [_chain([6] * int(rng.integers(4, 9)), rng) for _ in range(12)]
    hetero = [_chain([8, 7] * int(rng.integers(3, 5)), rng)
              for _ in range(12)]
    same = fcd(carbon[:6], carbon[6:])
    diff = fcd(carbon, hetero)
    assert diff > same


# --- STL --------------------------------------------------------------------


def _cube_triangles(s=2.0, center=(0.0, 0.0, 0.0)):
    """12 outward-oriented triangles of an axis-aligned cube, side s."""
    c = np.asarray(center)
    h = s / 2.0
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)]) + c
    # faces as vertex index quads (outward CCW), split into triangles
    quads = [
        (0, 1, 3, 2),   # x = -h (normal -x)
        (4, 6, 7, 5),   # x = +h
        (0, 4, 5, 1),   # y = -h
        (2, 3, 7, 6),   # y = +h
        (0, 2, 6, 4),   # z = -h
        (1, 5, 7, 3),   # z = +h
    ]
    tris = []
    for (a, b, cc, d) in quads:
        tris.append([v[a], v[b], v[cc]])
        tris.append([v[a], v[cc], v[d]])
    t = np.asarray(tris)
    # fix orientation: ensure signed volume positive
    det = np.einsum("ij,ij->i", t[:, 0] - c, np.cross(t[:, 1] - c,
                                                      t[:, 2] - c))
    flip = det < 0
    t[flip] = t[flip][:, [0, 2, 1]]
    return t


def test_cube_mass_properties():
    s = 2.0
    tris = _cube_triangles(s, center=(1.0, -2.0, 0.5))
    vol, com, inertia = mesh_mass_properties(tris)
    assert vol == pytest.approx(s ** 3, rel=1e-9)
    np.testing.assert_allclose(com, [1.0, -2.0, 0.5], atol=1e-9)
    # solid cube about CoM: I = m s^2 / 6 on the diagonal (m = volume here)
    expected = vol * s ** 2 / 6.0
    np.testing.assert_allclose(inertia, expected * np.eye(3), atol=1e-9)


def test_principal_components_box():
    # box 1 x 2 x 4: I_xx = m(b^2+c^2)/12 etc., ascending order
    a, b, c = 1.0, 2.0, 4.0
    tris = _cube_triangles(1.0) * np.array([a, b, c])
    vol, _, inertia = mesh_mass_properties(tris)
    assert vol == pytest.approx(a * b * c, rel=1e-9)
    m = vol
    expected = np.sort([m * (b * b + c * c) / 12.0,
                        m * (a * a + c * c) / 12.0,
                        m * (a * a + b * b) / 12.0])
    np.testing.assert_allclose(principal_inertia_components(tris), expected,
                               rtol=1e-9)


def test_stl_roundtrip_binary_and_ascii(tmp_path):
    tris = _cube_triangles(1.5)
    # binary
    bpath = str(tmp_path / "cube_bin.stl")
    with open(bpath, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))
            for vert in t:
                f.write(struct.pack("<3f", *vert))
            f.write(struct.pack("<H", 0))
    got = read_stl(bpath)
    np.testing.assert_allclose(got, tris, atol=1e-6)
    # ascii
    apath = str(tmp_path / "cube_ascii.stl")
    with open(apath, "w") as f:
        f.write("solid cube\n")
        for t in tris:
            f.write(" facet normal 0 0 0\n  outer loop\n")
            for vert in t:
                f.write(f"   vertex {vert[0]} {vert[1]} {vert[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid cube\n")
    got = read_stl(apath)
    np.testing.assert_allclose(got, tris, atol=1e-12)
    # pipeline use: context from file path
    pic = principal_inertia_components(bpath)
    assert pic.shape == (3,) and np.all(np.diff(pic) >= 0)
