"""Cross-checks: native C++ host-chemistry worker vs the pure-Python
reference implementations (native/chemhost.cpp vs chem/perception.py,
chem/canonical.py). Skipped when the library cannot be built."""

import os

import numpy as np
import pytest

from ml_conformer_generator_tpu.chem import native
from ml_conformer_generator_tpu.chem.mol import Molecule

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libchemhost.so unavailable")


def _py_connectivity(z, coords, tol=0.45):
    os.environ["MLCG_TPU_NO_NATIVE"] = "1"
    try:
        import importlib

        from ml_conformer_generator_tpu.chem import perception
        native._lib, native._tried = None, False
        out = perception.connectivity_from_distance(z, coords, tol)
    finally:
        del os.environ["MLCG_TPU_NO_NATIVE"]
        native._lib, native._tried = None, False
    return out


def _random_mol(rng, n=16):
    z = rng.choice([6, 7, 8, 9, 16, 17], size=n)
    coords = rng.standard_normal((n, 3)) * 2.0
    # random spanning tree + a few extra edges -> connected graph with rings
    bonds = []
    for i in range(1, n):
        j = int(rng.integers(0, i))
        bonds.append((j, i, int(rng.integers(1, 4))))
    for _ in range(3):
        i, j = sorted(rng.choice(n, size=2, replace=False).tolist())
        if i != j and (i, j) not in [(a, b) for a, b, _ in bonds]:
            bonds.append((i, j, 1))
    return Molecule(z, coords, bonds)


def test_connectivity_matches_python(rng):
    for _ in range(5):
        n = int(rng.integers(4, 30))
        z = rng.choice([6, 7, 8, 9, 16, 17, 35], size=n).astype(np.int64)
        coords = rng.standard_normal((n, 3)) * 1.5
        got = native.connectivity_from_distance(z, coords, 0.45)
        want = _py_connectivity(z, coords)
        assert got == want


def test_canonical_ranks_match_python(rng):
    from ml_conformer_generator_tpu.chem import canonical
    for _ in range(10):
        mol = _random_mol(rng, n=int(rng.integers(4, 30)))
        got = native.canonical_ranks(mol.atomic_nums, mol.charges, mol.bonds)
        # force the Python path for the reference result
        native._lib, native._tried = None, False
        os.environ["MLCG_TPU_NO_NATIVE"] = "1"
        try:
            want = canonical.canonical_ranks(mol)
        finally:
            del os.environ["MLCG_TPU_NO_NATIVE"]
            native._lib, native._tried = None, False
        np.testing.assert_array_equal(got, want)
        # ranks are a permutation 0..n-1 after tie-breaking
        assert sorted(got.tolist()) == list(range(mol.num_atoms))


def test_canonical_ranks_permutation_invariant(rng):
    mol = _random_mol(rng, n=18)
    ranks = native.canonical_ranks(mol.atomic_nums, mol.charges, mol.bonds)
    perm = rng.permutation(mol.num_atoms)
    inv = np.argsort(perm)
    mol2 = Molecule(mol.atomic_nums[perm], mol.coords[perm],
                    [(int(inv[a]), int(inv[b]), o) for a, b, o in mol.bonds],
                    mol.charges[perm])
    ranks2 = native.canonical_ranks(mol2.atomic_nums, mol2.charges,
                                    mol2.bonds)
    # same canonical order: atom perm[k] in mol2 has the rank of atom k
    np.testing.assert_array_equal(ranks2, ranks[perm])


def test_batch_matches_single(rng):
    mols = [_random_mol(rng, n=int(rng.integers(4, 25))) for _ in range(12)]
    batch = native.canonical_ranks_batch(mols, n_threads=4)
    for m, r in zip(mols, batch):
        single = native.canonical_ranks(m.atomic_nums, m.charges, m.bonds)
        np.testing.assert_array_equal(r, single)


def test_find_rings_matches_python(rng):
    from ml_conformer_generator_tpu.chem import perception
    for _ in range(8):
        mol = _random_mol(rng, n=int(rng.integers(5, 20)))
        got = native.find_rings(mol.num_atoms, mol.bonds)
        native._lib, native._tried = None, False
        os.environ["MLCG_TPU_NO_NATIVE"] = "1"
        try:
            want = perception.find_rings(mol)
        finally:
            del os.environ["MLCG_TPU_NO_NATIVE"]
            native._lib, native._tried = None, False
        assert {frozenset(r) for r in got} == {frozenset(r) for r in want}


def test_canonical_ranks_match_python_aromatic_and_charged(rng):
    """r4 review regression: the random-graph cross-check never hits the
    aromatic (order 4) valence weighting, the charge-adjusted max-valence
    rule, or the attached-H branches of the v2 invariants — exercise them
    with real aromatic/charged molecules AND random graphs carrying order-4
    bonds and nonzero charges (native/chemhost.cpp must stay bit-identical
    to chem/canonical.py on every branch)."""
    from ml_conformer_generator_tpu.chem import canonical, from_smiles
    from ml_conformer_generator_tpu.chem.sanitize import aromatize

    def py_ranks(mol):
        native._lib, native._tried = None, False
        os.environ["MLCG_TPU_NO_NATIVE"] = "1"
        try:
            return canonical.canonical_ranks(mol)
        finally:
            del os.environ["MLCG_TPU_NO_NATIVE"]
            native._lib, native._tried = None, False

    mols = [aromatize(from_smiles(s).remove_hs()) for s in [
        "c1ccccc1C(=O)[O-]",            # aromatic + carboxylate anion
        "C[N+](C)(C)Cc1ccccc1",         # quaternary cation
        "c1cc[nH+]cc1",                 # protonated aromatic N
        "c1cc[se]c1",                   # Se lone-pair aromatic
        "C[N+](=O)[O-]",                # charge-separated nitro
        "[O-]S(=O)(=O)[O-]",            # -2 net, S(VI)
        "Oc1ccc(cc1)C(=O)Nc1ccncc1",    # fused H-count diversity
        "c1ccc2[nH]ccc2c1",             # indole: kekulization-forced N-H
        "c1ccc2c(c1)[nH]c1ccccc12",     # carbazole: forced N-H, fused
        "c1cc2cc[nH]c2nc1",             # 7-azaindole: tautomer-ambiguous
        "c1ncc2[nH]cnc2n1",             # purine: tautomer-ambiguous
        "c1ccncc1-c1cc[nH]c1",          # forced pyridine + forced pyrrole
    ]]
    for _ in range(6):
        m = _random_mol(rng, n=int(rng.integers(5, 24)))
        m.bonds = [(i, j, 4 if rng.random() < 0.3 else o)
                   for i, j, o in m.bonds]
        ch = m.charges.copy()
        for a in rng.choice(m.num_atoms, size=2, replace=False):
            ch[a] = int(rng.integers(-1, 2))
        m.charges = ch
        mols.append(m)
    for mol in mols:
        got = native.canonical_ranks(mol.atomic_nums, mol.charges, mol.bonds)
        np.testing.assert_array_equal(got, py_ranks(mol))
