"""Molecular graph container with fixed-size padded encodings.

Parity component for the reference's ``MolGraph``
(``/root/reference/src/mlconfgen/utils/molgraph.py:44-297``): a COO graph of
atomic numbers + bond types with converters to/from the dense padded tensors
used by the bond predictor, plus the batched ``vector_graph_sort`` training
utility. Host-side parts are numpy; ``vector_graph_sort`` is a pure jittable
JAX function (one gather program instead of the reference's chained
repeat_interleave/gather torch ops).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DIMENSION, ELEMENTS_TO_CLASS, NUM_BOND_TYPES,
                      PERMITTED_ELEMENTS)
from .mol import Molecule

__all__ = ["MolGraph", "vector_graph_sort"]


@dataclasses.dataclass
class MolGraph:
    """COO molecular graph: ``x`` (n,) atomic numbers; ``edge_index`` (2, E)
    directed bonds (both directions stored); ``edge_attr`` (E,) bond types
    1=single, 2=double, 3=triple, 4=aromatic."""

    x: np.ndarray
    edge_index: np.ndarray
    edge_attr: np.ndarray

    def __post_init__(self):
        self.x = np.asarray(self.x, dtype=np.int64)
        self.edge_index = np.asarray(self.edge_index,
                                     dtype=np.int64).reshape(2, -1)
        self.edge_attr = np.asarray(self.edge_attr, dtype=np.int64).ravel()

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_molecule(cls, mol: Molecule, remove_hs: bool = True) -> "MolGraph":
        """Reference ``MolGraph.from_mol`` (``molgraph.py:104-157``): both bond
        directions are materialised; raises if the molecule has no bonds."""
        if remove_hs:
            mol = mol.remove_hs()
        if not mol.bonds:
            raise ValueError(
                f"Bonds must be specified for the molecule - {mol.name!r}.")
        src, dst, attr = [], [], []
        for i, j, order in mol.bonds:
            src += [i, j]
            dst += [j, i]
            attr += [order, order]
        return cls(mol.atomic_nums.copy(), np.array([src, dst]),
                   np.array(attr))

    @classmethod
    def from_adjacency_matrix(cls, nodes: np.ndarray,
                              adjacency_matrix: np.ndarray) -> "MolGraph":
        """Reference ``molgraph.py:56-102``: nodes (n,) atomic numbers and a
        one-hot (DIMENSION, DIMENSION, NUM_BOND_TYPES) adjacency; channel 0
        means 'no bond'."""
        nodes = np.asarray(nodes)
        if nodes.ndim == 2:       # reference accepts [[atomic_num, extra]...]
            nodes = nodes[:, 0]
        n = nodes.shape[0]
        am = np.asarray(adjacency_matrix)
        if am.shape != (DIMENSION, DIMENSION, NUM_BOND_TYPES):
            raise ValueError(
                f"Adjacency matrix should be of size {DIMENSION} with bond "
                f"encoding with size of {NUM_BOND_TYPES}")
        bond_type = np.argmax(am[:n, :n], axis=2)
        src, dst = np.nonzero(bond_type)
        return cls(nodes, np.stack([src, dst]), bond_type[src, dst])

    # -- encodings ------------------------------------------------------------

    def adjacency_matrix(self, padded: bool = True) -> np.ndarray:
        """One-hot (D, D, NUM_BOND_TYPES) float adjacency; channel 0 = no bond
        (reference ``molgraph.py:159-199``). Symmetrised."""
        n = self.num_nodes
        if n > DIMENSION:
            raise ValueError(
                f"The graph should have not more than {DIMENSION} nodes")
        d = DIMENSION if padded else n
        am = np.zeros((d, d, NUM_BOND_TYPES), dtype=np.float32)
        am[:, :, 0] = 1.0
        for k in range(self.edge_attr.shape[0]):
            i, j = self.edge_index[0, k], self.edge_index[1, k]
            t = int(self.edge_attr[k])
            am[i, j, 0] = am[j, i, 0] = 0.0
            am[i, j, t] = am[j, i, t] = 1.0
        return am

    def elements_vector(self) -> np.ndarray:
        """(DIMENSION,) int64 atomic numbers, zero padded (``molgraph.py:226-236``)."""
        v = np.zeros(DIMENSION, dtype=np.int64)
        v[: self.num_nodes] = self.x
        return v

    def one_hot_elements_encoding(self, max_n_nodes: int) -> np.ndarray:
        """(max_n_nodes, n_classes) one-hot over PERMITTED_ELEMENTS classes
        (``molgraph.py:238-252``)."""
        oh = np.zeros((max_n_nodes, len(PERMITTED_ELEMENTS)), dtype=np.int64)
        for i, z in enumerate(self.x):
            oh[i, ELEMENTS_TO_CLASS[int(z)]] = 1
        return oh

    def to_molecule(self, coords: Optional[np.ndarray] = None) -> Molecule:
        """Rebuild a ``Molecule``; unlike the reference's ``to_rdkit_mol``
        (``molgraph.py:201-224``) coordinates can be attached directly."""
        n = self.num_nodes
        xyz = (np.zeros((n, 3)) if coords is None
               else np.asarray(coords, dtype=np.float64)[:n])
        bonds = []
        seen = set()
        for k in range(self.edge_attr.shape[0]):
            i, j = int(self.edge_index[0, k]), int(self.edge_index[1, k])
            key = (min(i, j), max(i, j))
            if key in seen or i == j:
                continue
            seen.add(key)
            bonds.append((key[0], key[1], int(self.edge_attr[k])))
        return Molecule(self.x.copy(), xyz, bonds)


@jax.jit
def vector_graph_sort(elements: jnp.ndarray, coordinates: jnp.ndarray,
                      adjacency_matrix: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched node sort by (element + squared CoM distance), descending, with
    a consistent permutation of the one-hot adjacency.

    Training-era utility matching reference ``molgraph.py:255-297``:
    elements (B, D); coordinates (B, D, 3); adjacency (B, D, D, C) one-hot.
    Returns (sorted_elements, sorted_coordinates, sorted_one_hot_adjacency).
    One jittable program: argsort + two-axis take_along_axis (the reference
    flattens and gathers with repeat_interleave index arithmetic).
    """
    d2 = jnp.sum(coordinates * coordinates, axis=-1)             # (B, D)
    order = jnp.argsort(-(elements + d2), axis=1, stable=True)   # (B, D)

    sorted_elements = jnp.take_along_axis(elements, order, axis=1)
    sorted_coords = jnp.take_along_axis(
        coordinates, order[..., None], axis=1)

    bond = jnp.argmax(adjacency_matrix, axis=-1)                 # (B, D, D)
    bond = jnp.take_along_axis(bond, order[:, :, None], axis=1)
    bond = jnp.take_along_axis(bond, order[:, None, :], axis=2)
    one_hot = jax.nn.one_hot(bond, adjacency_matrix.shape[-1],
                             dtype=jnp.float32)
    return sorted_elements, sorted_coords, one_hot
