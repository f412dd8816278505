"""Tests for distribution metrics (FFD), identity keys, and the evaluation
harness (reference behaviours: ``research_scripts/ffd_fcd/ffd_comparison.py``
and ``research_scripts/evaluation.py``)."""

import numpy as np

from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.eval.frechet import (ffd, frechet_distance,
                                                     identity_key, uniqueness)
from ml_conformer_generator_tpu.eval.harness import (format_report,
                                                     run_evaluation)


def _ethanolish(perm=None, jitter=0.0, rng=None):
    """C-C-O chain with deterministic 3D coords, optionally relabelled."""
    z = np.array([6, 6, 8])
    coords = np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.2, 1.1, 0.0]])
    bonds = [(0, 1, 1), (1, 2, 1)]
    if rng is not None and jitter:
        coords = coords + jitter * rng.standard_normal(coords.shape)
    if perm is not None:
        inv = np.argsort(perm)
        z = z[perm]
        coords = coords[perm]
        bonds = [(int(inv[a]), int(inv[b]), o) for a, b, o in bonds]
    return Molecule(z, coords, bonds)


def test_identity_key_invariant_to_relabelling():
    m1 = _ethanolish()
    m2 = _ethanolish(perm=np.array([2, 0, 1]))
    assert identity_key(m1) == identity_key(m2)


def test_identity_key_distinguishes_bond_order():
    m1 = _ethanolish()
    m2 = _ethanolish()
    m2.bonds = [(0, 1, 2), (1, 2, 1)]
    assert identity_key(m1) != identity_key(m2)


def test_uniqueness_counts():
    mols = [_ethanolish(), _ethanolish(perm=np.array([1, 0, 2]))]
    stats = uniqueness(mols)
    assert stats["unique_within_batch"] == 1
    stats2 = uniqueness(mols, corpus_keys=[identity_key(mols[0])])
    assert stats2["unique_vs_corpus"] == 0


def test_frechet_distance_zero_for_identical_sets(rng):
    emb = rng.standard_normal((64, 16))
    d = frechet_distance(emb, emb)
    assert abs(d) < 1e-6


def test_frechet_distance_mean_shift(rng):
    """For equal covariance, FD reduces to ||mu1 - mu2||^2."""
    emb = rng.standard_normal((4096, 8))
    shift = np.zeros(8)
    shift[0] = 3.0
    d = frechet_distance(emb, emb + shift)
    assert abs(d - 9.0) < 0.05


def test_ffd_separates_distributions(rng):
    near = [_ethanolish(jitter=0.01, rng=rng) for _ in range(8)]
    far = []
    for _ in range(8):
        m = _ethanolish(jitter=0.01, rng=rng)
        m.atomic_nums = np.array([7, 7, 16])
        far.append(m)
    assert ffd(near, far, n_bits=256) > ffd(near, near, n_bits=256) + 1.0


class _FakeGenerator:
    """Duck-typed generator returning canned molecules (harness logic test)."""

    def __init__(self, per_request):
        self.per_request = per_request

    def generate_conformers(self, reference_conformer=None, n_samples=10,
                            variance=2, **kw):
        return [m.copy() for m in self.per_request]


def test_run_evaluation_aggregates(tmp_path, rng):
    ref = _ethanolish()
    gen = _FakeGenerator([_ethanolish(jitter=0.05, rng=rng)
                          for _ in range(3)])
    sdf = str(tmp_path / "out.sdf")
    rep = run_evaluation(gen, [ref, ref], n_samples=4, variance=1,
                         sdf_path=sdf)
    assert rep.n_references == 2
    assert rep.n_requested == 8
    assert rep.n_valid == 6
    assert 0 < rep.validity < 1
    assert rep.avg_shape_tanimoto > 0.3   # same scaffold, slight jitter
    assert 3 in rep.by_ref_size and rep.by_ref_size[3]["n"] == 6
    assert 0 in rep.by_variance
    text = format_report(rep)
    assert "Valid molecules generated" in text
    assert open(sdf).read().count("$$$$") == 6
