"""Evaluation layer: shape quadrupole parity vs torch reference, cliques,
grid Tanimoto invariances, Morgan fingerprints, evaluate_samples contract."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ml_conformer_generator_tpu.chem.io import read_mol_file
from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.eval.fingerprints import (morgan_fingerprint,
                                                          tanimoto)
from ml_conformer_generator_tpu.eval.pipeline import evaluate_samples
from ml_conformer_generator_tpu.eval.shape import (find_cliques,
                                                   shape_quadrupole,
                                                   tanimoto_batch,
                                                   tanimoto_score)

DEMO = "/root/reference/assets/demo_files"


def _random_coords(rng, n=18, scale=2.5):
    return rng.standard_normal((n, 3)) * scale


def test_find_cliques_matches_bruteforce(rng):
    n = 12
    coords = _random_coords(rng, n)
    d = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    adj = (d > 0) & (d < 5.4)
    for k in (2, 3, 4):
        got = {tuple(row) for row in find_cliques(adj, k)}
        want = {c for c in itertools.combinations(range(n), k)
                if all(adj[a, b] for a, b in itertools.combinations(c, 2))}
        assert got == want, f"k={k}"


def test_shape_quadrupole_parity_vs_torch(rng):
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ref_shape", "/root/reference/src/mlconfgen/cheminformatics/"
        "shape_similarity.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    coords = _random_coords(rng, 16)
    moments, frame = shape_quadrupole(coords)
    torch.set_default_dtype(torch.float64)  # ref mixes fresh tensors w/ input
    try:
        r_mom, r_frame = ref.get_shape_quadrupole_for_molecule(
            torch.tensor(coords, dtype=torch.float64))
    finally:
        torch.set_default_dtype(torch.float32)
    np.testing.assert_allclose(moments, r_mom.numpy(), rtol=1e-6)
    # Eigenvector signs are ambiguous: compare up to per-axis sign.
    rf = r_frame.numpy()
    for ax in range(3):
        col, rcol = frame[:, ax], rf[:, ax]
        sign = 1.0 if np.dot(col, rcol) >= 0 else -1.0
        np.testing.assert_allclose(col, sign * rcol, rtol=1e-5, atol=1e-8)


def test_tanimoto_identity_and_bounds(rng):
    coords = _random_coords(rng, 14)
    s = tanimoto_score(coords, coords, n_grid=24)
    assert s == pytest.approx(1.0, abs=1e-5)
    other = _random_coords(rng, 14) + np.array([20.0, 0, 0])
    s2 = tanimoto_score(coords, other, n_grid=24)
    assert 0.0 <= s2 < 0.2


def test_tanimoto_batch_matches_single(rng):
    ref = _random_coords(rng, 12)
    cands = [_random_coords(rng, n) for n in (10, 14)]
    n_max = max(c.shape[0] for c in cands)
    batch = np.zeros((2, n_max, 3), dtype=np.float32)
    mask = np.zeros((2, n_max), dtype=np.float32)
    for i, c in enumerate(cands):
        batch[i, : c.shape[0]] = c
        mask[i, : c.shape[0]] = 1.0
    scores = np.asarray(tanimoto_batch(
        jnp.asarray(ref, dtype=jnp.float32), jnp.ones(12, dtype=jnp.float32),
        jnp.asarray(batch), jnp.asarray(mask), n_grid=16))
    assert scores.shape == (2, 4)
    for i, c in enumerate(cands):
        single = tanimoto_score(ref, c, n_grid=16)
        assert scores[i, 0] == pytest.approx(single, abs=1e-5)


def test_morgan_fingerprint_basiscs():
    # Propane vs propane: identical; vs cyclopropane: different.
    propane = Molecule(np.array([6, 6, 6]), np.zeros((3, 3)),
                       [(0, 1, 1), (1, 2, 1)])
    cyclo = Molecule(np.array([6, 6, 6]), np.zeros((3, 3)),
                     [(0, 1, 1), (1, 2, 1), (0, 2, 1)])
    fp1 = morgan_fingerprint(propane)
    fp2 = morgan_fingerprint(propane.copy())
    fp3 = morgan_fingerprint(cyclo)
    assert tanimoto(fp1, fp2) == 1.0
    assert tanimoto(fp1, fp3) < 1.0
    assert fp1.shape == (2048,)
    # Renumbering-invariant: reverse atom order of an asymmetric molecule.
    mol = Molecule(np.array([6, 7, 8, 6]), np.zeros((4, 3)),
                   [(0, 1, 1), (1, 2, 2), (2, 3, 1)])
    rev = mol.renumber([3, 2, 1, 0])
    assert tanimoto(morgan_fingerprint(mol), morgan_fingerprint(rev)) == 1.0


def test_evaluate_samples_contract(rng):
    ref = read_mol_file(f"{DEMO}/ceyyag.mol")
    samples = [read_mol_file(f"{DEMO}/yibfeu.mol"),
               read_mol_file(f"{DEMO}/ceyyag.mol")]
    ref_block, results = evaluate_samples(ref, samples, n_grid=16)
    assert "V2000" in ref_block
    assert len(results) == 2
    for r in results:
        assert set(r) == {"mol_block", "shape_tanimoto", "chemical_tanimoto"}
        assert 0.0 <= r["shape_tanimoto"] <= 1.0
        assert 0.0 <= r["chemical_tanimoto"] <= 1.0
    # The reference evaluated against itself: perfect chemical similarity,
    # near-perfect shape similarity.
    assert results[1]["chemical_tanimoto"] == pytest.approx(1.0)
    assert results[1]["shape_tanimoto"] > 0.95


def test_inchi_analog_key_protonation_layer():
    """VERDICT r3 item 7: novelty keys follow InChI's protonation handling
    (reference keys by Chem.MolToInchi, evaluation.py:12-42)."""
    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.eval.frechet import inchi_analog_key

    def k(smi):
        return inchi_analog_key(from_smiles(smi).remove_hs())

    # different drawings of the same protomer system collapse (glycine
    # zwitterion == neutral glycine; InChI: same string, no /p)
    assert k("NCC(=O)O") == k("[NH3+]CC(=O)[O-]")
    # acid vs conjugate base: same skeleton, differ ONLY in the /p layer
    acid, base = k("CC(=O)O"), k("CC(=O)[O-]")
    assert acid != base and base == acid + "/p-1"
    # cation: pyridinium = pyridine /p+1
    assert k("c1cc[nH+]cc1") == k("c1ccncc1") + "/p+1"
    # sulfate dianion: /p-2
    assert k("[O-]S(=O)(=O)[O-]") == k("OS(=O)(=O)O") + "/p-2"
    # charge-separated groups InChI keeps intact: nitro untouched, no /p
    nitro = k("C[N+](=O)[O-]")
    assert "/p" not in nitro
    # quaternary ammonium: no removable proton -> charge stays, no /p
    quat = k("C[N+](C)(C)C")
    assert "/p" not in quat and "+" in quat


def test_inchi_analog_key_documented_tautomer_divergence():
    """Documented divergence vs real InChI (PARITY.md): the mobile-H layer
    is not reproduced — 2-pyridone and 2-hydroxypyridine stay distinct
    (InChI merges them), so novelty counts are a lower bound."""
    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.eval.frechet import inchi_analog_key

    pyridone = inchi_analog_key(from_smiles("O=c1cccc[nH]1").remove_hs())
    hydroxypyridine = inchi_analog_key(from_smiles("Oc1ccccn1").remove_hs())
    assert pyridone != hydroxypyridine


def test_uniqueness_uses_inchi_analog_keys():
    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.eval.frechet import (inchi_analog_key,
                                                         uniqueness)

    mols = [from_smiles(s).remove_hs()
            for s in ["NCC(=O)O", "[NH3+]CC(=O)[O-]", "CCO"]]
    corpus = [inchi_analog_key(from_smiles("NCC(=O)O").remove_hs())]
    u = uniqueness(mols, corpus)
    assert u["unique_within_batch"] == 2      # glycine forms collapse
    assert u["unique_vs_corpus"] == 1         # only ethanol is novel


def test_evaluate_samples_survives_degenerate_geometry():
    """r4 regression: a degenerate sample (coincident atoms -> quadrupole
    eigh failure) must not kill the whole scoring batch; it scores 0."""
    import numpy as np

    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.chem.mol import Molecule
    from ml_conformer_generator_tpu.eval.pipeline import evaluate_samples

    ref = from_smiles("CCO").remove_hs()
    ref.coords = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.3, 1.1, 0]])
    good = ref.copy()
    # exploded coordinates (an undertrained sampler emits 1e20-scale
    # positions): quadrupole moments overflow -> eigh diverges
    bad = Molecule(np.array([6, 6, 6]),
                   np.array([[1e20, 0, 0], [0, 1e20, 0], [np.nan, 0, 0]]))
    _, scored = evaluate_samples(ref, [good, bad])
    assert len(scored) == 2
    assert scored[0]["shape_tanimoto"] > 0.5
    assert scored[1]["shape_tanimoto"] == 0.0
