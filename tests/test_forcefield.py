"""Geometry-quality tests of the batched restrained force field
(chem/forcefield.py) — the analog of the reference's constrained MMFF94 stage
(``utils/standardizer.py:62-80``).

The production regime is local cleanup of near-valid geometries under the
0.2 A flat-bottom restraints, so each test perturbs a correct structure by
<= 0.15 A and asserts the relevant internal coordinates recover: bond
lengths, sp3 angles, sp2/aromatic planarity, and double-bond torsions."""

import numpy as np

from ml_conformer_generator_tpu.chem import find_rings, read_mol_file
from ml_conformer_generator_tpu.chem.forcefield import optimize_geometry
from ml_conformer_generator_tpu.chem.mol import Molecule

CEYYAG = "/root/reference/assets/demo_files/ceyyag.mol"


def _perturb(mol, scale, seed=0):
    rng = np.random.default_rng(seed)
    out = mol.copy()
    noise = rng.standard_normal(out.coords.shape)
    noise *= scale / np.maximum(np.linalg.norm(noise, axis=1,
                                               keepdims=True), 1e-9)
    out.coords = out.coords + noise
    return out


def _plane_residual(coords):
    """Max distance of the points to their best-fit plane."""
    c = coords - coords.mean(axis=0)
    _, _, vt = np.linalg.svd(c)
    return np.abs(c @ vt[2]).max()


def _angle(coords, i, c, j):
    u = coords[i] - coords[c]
    v = coords[j] - coords[c]
    cos = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def _dihedral(coords, i, b, c, j):
    b1 = coords[i] - coords[b]
    ax = coords[c] - coords[b]
    b2 = coords[j] - coords[c]
    n1 = np.cross(b1, ax)
    n2 = np.cross(ax, b2)
    cos = n1 @ n2 / (np.linalg.norm(n1) * np.linalg.norm(n2))
    return np.degrees(np.arccos(np.clip(abs(cos), -1, 1)))  # folded to [0,90]


def test_aromatic_ring_planarity_and_bonds_recover():
    mol = read_mol_file(CEYYAG).remove_hs()
    rings = [r for r in find_rings(mol) if len(r) == 6]
    assert rings, "demo molecule should have a 6-ring"
    bad = _perturb(mol, 0.15)
    bad_res = max(_plane_residual(bad.coords[list(r)]) for r in rings)
    relaxed = optimize_geometry([bad], n_steps=400)[0]

    for ring in rings:
        res = _plane_residual(relaxed.coords[list(ring)])
        assert res < 0.08, f"ring not planar after relax: {res:.3f} A"
    assert bad_res > 0.1  # the perturbation really did pucker the rings

    # ring bond lengths return to the aromatic C-C/C-N range
    ring_atoms = {a for r in rings for a in r}
    for i, j, o in mol.bonds:
        if i in ring_atoms and j in ring_atoms and o == 4:
            d = np.linalg.norm(relaxed.coords[i] - relaxed.coords[j])
            assert 1.25 < d < 1.52, f"aromatic bond {i}-{j} = {d:.3f} A"


def test_sp3_angles_recover():
    # neopentane heavy atoms: central C + 4 methyl C at ideal tetrahedron
    r = 1.54
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     dtype=float) / np.sqrt(3.0) * r
    coords = np.vstack([[0.0, 0.0, 0.0], verts])
    mol = Molecule(np.array([6] * 5), coords,
                   [(0, k, 1) for k in range(1, 5)])
    bad = _perturb(mol, 0.12, seed=3)
    relaxed = optimize_geometry([bad], n_steps=400)[0]
    for a in range(1, 5):
        for b in range(a + 1, 5):
            ang = _angle(relaxed.coords, a, 0, b)
            assert abs(ang - 109.47) < 6.0, f"angle {a}-0-{b} = {ang:.1f}"
        d = np.linalg.norm(relaxed.coords[a] - relaxed.coords[0])
        assert abs(d - 1.54) < 0.12


def test_double_bond_torsion_recovers_planarity():
    # 2-butene heavy atoms: C0-C1=C2-C3, C0/C3 twisted ~11 deg out of plane
    coords = np.array([
        [-1.95, 0.85, 0.0],
        [-0.67, 0.33, 0.0],
        [0.67, -0.33, 0.0],
        [1.95, -0.85, 0.0],
    ])
    mol = Molecule(np.array([6, 6, 6, 6]), coords.copy(),
                   [(0, 1, 1), (1, 2, 2), (2, 3, 1)])
    # rotate C0 about the C1=C2 axis by ~10 deg (|displacement| ~ 0.17 A)
    twisted = mol.copy()
    axis = coords[2] - coords[1]
    axis /= np.linalg.norm(axis)
    theta = np.radians(10.0)
    k = axis
    v = twisted.coords[0] - coords[1]
    twisted.coords[0] = coords[1] + (
        v * np.cos(theta) + np.cross(k, v) * np.sin(theta)
        + k * (k @ v) * (1 - np.cos(theta)))
    assert _dihedral(twisted.coords, 0, 1, 2, 3) > 8.0
    relaxed = optimize_geometry([twisted], n_steps=400)[0]
    assert _dihedral(relaxed.coords, 0, 1, 2, 3) < 4.0


def test_restraints_bound_total_drift():
    """The flat-bottom restraints keep every atom near its input position
    (the reference's 0.2 A constraint intent)."""
    mol = read_mol_file(CEYYAG).remove_hs()
    relaxed = optimize_geometry([mol], n_steps=400)[0]
    drift = np.linalg.norm(relaxed.coords - mol.coords, axis=1).max()
    assert drift < 0.35  # 0.2 A flat region + bounded spring stretch


def test_batch_relaxation_matches_single():
    """Batching must not change per-molecule results (padded terms inert)."""
    m1 = read_mol_file(CEYYAG).remove_hs()
    m2 = _perturb(m1, 0.1, seed=5)
    single = optimize_geometry([m2], n_steps=100)[0]
    batched = optimize_geometry([m1, m2], n_steps=100)[1]
    np.testing.assert_allclose(batched.coords, single.coords, atol=2e-3)


def test_hybridisation_hypervalent_and_sp2():
    """Hypervalent S/P stay tetrahedral/pyramidal; nitro N is trigonal, not
    linear; nitriles are linear; no improper term flattens a sulfoxide."""
    from ml_conformer_generator_tpu.chem.forcefield import (_hybridisation,
                                                            build_ff_batch)

    def hyb(zs, bonds):
        m = Molecule(np.array(zs), np.zeros((len(zs), 3)), bonds)
        neigh = m.neighbors()
        orders = {}
        for i, j, o in m.bonds:
            orders[(i, j)] = o
            orders[(j, i)] = o
        return _hybridisation(m, neigh, orders), m

    # sulfone S(=O)(=O)(C)(C) -> tetrahedral
    h, _ = hyb([16, 8, 8, 6, 6], [(0, 1, 2), (0, 2, 2), (0, 3, 1), (0, 4, 1)])
    assert h[0] == 4
    # sulfoxide S(=O)(C)(C) -> pyramidal (sp3 label), and NO improper on S
    h, m = hyb([16, 8, 6, 6], [(0, 1, 2), (0, 2, 1), (0, 3, 1)])
    assert h[0] == 4
    ff = build_ff_batch([m], 8)
    assert ff.improper_mask.sum() == 0
    # nitro N(=O)(=O)C -> trigonal planar (sp2), WITH an improper
    h, m = hyb([7, 8, 8, 6], [(0, 1, 2), (0, 2, 2), (0, 3, 1)])
    assert h[0] == 3
    ff = build_ff_batch([m], 8)
    assert ff.improper_mask.sum() == 1
    # nitrile carbon C(#N)(C) -> linear
    h, _ = hyb([6, 7, 6], [(0, 1, 3), (0, 2, 1)])
    assert h[0] == 2
    # aromatic ring carbon (kekulised): sp2
    h, _ = hyb([6, 6, 6], [(0, 1, 2), (0, 2, 1)])
    assert h[0] == 3


def test_relaxation_restores_perturbed_demo_geometry():
    """VERDICT r3 item 8: 'MMFF-class local cleanup' is a measured claim —
    relaxing noise-perturbed experimental conformers must reduce bond-length
    RMS, angle RMS, and aromatic out-of-plane deviation vs the experimental
    geometry (full table: scripts/ff_geometry_parity.py + PARITY.md)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from scripts.ff_geometry_parity import measure

    from ml_conformer_generator_tpu.chem.io import read_mol_file

    m = read_mol_file("/root/reference/assets/demo_files/paba.mol").remove_hs()
    m.name = "paba"
    (row,) = measure([m], sigma=0.15, steps=200, seed=3)
    assert row["bond_rms_relaxed_A"] < 0.75 * row["bond_rms_perturbed_A"]
    assert row["angle_rms_relaxed_deg"] < 0.5 * row["angle_rms_perturbed_deg"]
    assert row["planarity_relaxed_A"] < 0.4 * row["planarity_perturbed_A"]
