"""MolGraph container + vector_graph_sort parity tests (reference
``utils/molgraph.py:44-297``)."""

import numpy as np
import jax.numpy as jnp

from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.chem.molgraph import (MolGraph,
                                                      vector_graph_sort)
from ml_conformer_generator_tpu.config import DIMENSION, NUM_BOND_TYPES


def _mol():
    # propenal-like: C=C-C=O
    z = np.array([6, 6, 6, 8])
    coords = np.arange(12, dtype=float).reshape(4, 3)
    bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2)]
    return Molecule(z, coords, bonds)


def test_from_molecule_roundtrip():
    g = MolGraph.from_molecule(_mol())
    assert g.num_nodes == 4
    assert g.edge_index.shape == (2, 6)          # both directions
    m2 = g.to_molecule()
    assert sorted(m2.bonds) == sorted(_mol().bonds)


def test_adjacency_matrix_one_hot_symmetric():
    g = MolGraph.from_molecule(_mol())
    am = g.adjacency_matrix()
    assert am.shape == (DIMENSION, DIMENSION, NUM_BOND_TYPES)
    assert am[0, 1, 2] == 1 and am[1, 0, 2] == 1
    assert am[0, 1, 0] == 0
    # untouched pairs are 'no bond'
    assert am[0, 3, 0] == 1
    # one-hot along the channel axis everywhere
    assert np.all(am.sum(axis=2) == 1)


def test_adjacency_roundtrip_through_from_adjacency_matrix():
    g = MolGraph.from_molecule(_mol())
    am = g.adjacency_matrix()
    g2 = MolGraph.from_adjacency_matrix(g.x, am)
    assert np.array_equal(
        g2.adjacency_matrix(), am)


def test_elements_and_one_hot():
    g = MolGraph.from_molecule(_mol())
    v = g.elements_vector()
    assert v.shape == (DIMENSION,)
    assert list(v[:4]) == [6, 6, 6, 8] and v[4:].sum() == 0
    oh = g.one_hot_elements_encoding(10)
    assert oh.shape == (10, 8)
    assert oh[0, 0] == 1 and oh[3, 2] == 1       # C -> class 0, O -> class 2
    assert oh.sum() == 4


def test_vector_graph_sort_consistency(rng):
    B, D, C = 2, 8, NUM_BOND_TYPES
    elements = jnp.asarray(rng.integers(1, 35, size=(B, D)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((B, D, 3)), jnp.float32)
    bond = rng.integers(0, C, size=(B, D, D))
    bond = np.triu(bond, 1) + np.triu(bond, 1).transpose(0, 2, 1)
    adj = jnp.asarray(np.eye(C)[bond], jnp.float32)

    se, sc, sa = vector_graph_sort(elements, coords, adj)

    # keys are descending
    keys = np.asarray(se + jnp.sum(sc * sc, axis=-1))
    assert np.all(np.diff(keys, axis=1) <= 1e-5)
    # adjacency permuted consistently: check one (b, i, j) entry
    order = np.argsort(-(np.asarray(elements)
                         + np.asarray(jnp.sum(coords * coords, -1))),
                       axis=1, kind="stable")
    b, i, j = 1, 2, 5
    oi, oj = order[b, i], order[b, j]
    assert np.argmax(np.asarray(sa)[b, i, j]) == bond[b, oi, oj]
