"""Molecule container for the host-side chemistry pipeline.

Replaces the reference's RDKit ``Chem.Mol`` + ``MolGraph`` pair
(``/root/reference/src/mlconfgen/utils/molgraph.py:44-252``) with a small
numpy-backed structure: atoms (atomic numbers, coordinates, formal charges)
plus an explicit bond list with integer orders (1 single, 2 double, 3 triple,
4 aromatic).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import DIMENSION, ELEMENTS_TO_CLASS, NUM_BOND_TYPES
from . import periodic

Bond = Tuple[int, int, int]  # (i, j, order)


@dataclasses.dataclass
class Molecule:
    atomic_nums: np.ndarray                 # (n,) int
    coords: np.ndarray                      # (n, 3) float64
    bonds: List[Bond] = dataclasses.field(default_factory=list)
    charges: Optional[np.ndarray] = None    # (n,) int formal charges
    name: str = ""

    def __post_init__(self):
        self.atomic_nums = np.asarray(self.atomic_nums, dtype=np.int64)
        self.coords = np.asarray(self.coords, dtype=np.float64)
        if self.charges is None:
            self.charges = np.zeros(self.num_atoms, dtype=np.int64)
        else:
            self.charges = np.asarray(self.charges, dtype=np.int64)

    # -- basic properties ----------------------------------------------------

    @property
    def num_atoms(self) -> int:
        return int(self.atomic_nums.shape[0])

    @property
    def num_bonds(self) -> int:
        return len(self.bonds)

    def symbols(self) -> List[str]:
        return [periodic.symbol(int(z)) for z in self.atomic_nums]

    def copy(self) -> "Molecule":
        return Molecule(self.atomic_nums.copy(), self.coords.copy(),
                        [tuple(b) for b in self.bonds], self.charges.copy(),
                        self.name)

    # -- bond bookkeeping ------------------------------------------------------

    def bond_order_matrix(self) -> np.ndarray:
        """(n, n) int matrix of bond orders (aromatic encoded as 4)."""
        n = self.num_atoms
        m = np.zeros((n, n), dtype=np.int64)
        for i, j, order in self.bonds:
            m[i, j] = order
            m[j, i] = order
        return m

    def neighbors(self) -> List[List[int]]:
        adj: List[List[int]] = [[] for _ in range(self.num_atoms)]
        for i, j, _ in self.bonds:
            adj[i].append(j)
            adj[j].append(i)
        return adj

    def heavy_atom_indices(self) -> np.ndarray:
        return np.nonzero(self.atomic_nums != 1)[0]

    def remove_hs(self) -> "Molecule":
        """Return a copy with hydrogens stripped (indices remapped)."""
        keep = self.heavy_atom_indices()
        remap = {int(old): new for new, old in enumerate(keep)}
        bonds = [(remap[i], remap[j], o) for i, j, o in self.bonds
                 if i in remap and j in remap]
        return Molecule(self.atomic_nums[keep], self.coords[keep], bonds,
                        self.charges[keep], self.name)

    def subset(self, indices: Sequence[int]) -> "Molecule":
        indices = list(indices)
        remap = {int(old): new for new, old in enumerate(indices)}
        bonds = [(remap[i], remap[j], o) for i, j, o in self.bonds
                 if i in remap and j in remap]
        return Molecule(self.atomic_nums[indices], self.coords[indices], bonds,
                        self.charges[indices], self.name)

    def renumber(self, order: Sequence[int]) -> "Molecule":
        """Reorder atoms so new index k holds old atom ``order[k]``."""
        return self.subset(order)

    # -- fragment decomposition ------------------------------------------------

    def connected_components(self) -> List[List[int]]:
        n = self.num_atoms
        adj = self.neighbors()
        seen = np.zeros(n, dtype=bool)
        comps: List[List[int]] = []
        for start in range(n):
            if seen[start]:
                continue
            stack, comp = [start], []
            seen[start] = True
            while stack:
                v = stack.pop()
                comp.append(v)
                for w in adj[v]:
                    if not seen[w]:
                        seen[w] = True
                        stack.append(w)
            comps.append(sorted(comp))
        return comps

    def largest_fragment(self) -> "Molecule":
        comps = self.connected_components()
        best = max(comps, key=len)
        return self.subset(best)

    # -- featurisation (model inputs) ------------------------------------------

    def distance_matrix(self) -> np.ndarray:
        d = self.coords[:, None, :] - self.coords[None, :, :]
        return np.sqrt(np.sum(d * d, axis=-1))

    def elements_vector(self, dimension: int = DIMENSION) -> np.ndarray:
        """Zero-padded atomic-number vector (reference ``molgraph.py:226-236``)."""
        v = np.zeros(dimension, dtype=np.int64)
        v[: self.num_atoms] = self.atomic_nums
        return v

    def one_hot_elements_encoding(self, max_n_nodes: int) -> np.ndarray:
        """One-hot atom classes over PERMITTED_ELEMENTS (``molgraph.py:238-252``)."""
        out = np.zeros((max_n_nodes, len(ELEMENTS_TO_CLASS)), dtype=np.int64)
        for i, z in enumerate(self.atomic_nums):
            out[i, ELEMENTS_TO_CLASS[int(z)]] = 1
        return out

    def adjacency_one_hot(self, dimension: int = DIMENSION,
                          num_bond_types: int = NUM_BOND_TYPES) -> np.ndarray:
        """(dim, dim, num_bond_types) one-hot with channel 0 = no bond."""
        out = np.zeros((dimension, dimension, num_bond_types), dtype=np.float32)
        out[:, :, 0] = 1.0
        for i, j, order in self.bonds:
            out[i, j, 0] = out[j, i, 0] = 0.0
            out[i, j, order] = out[j, i, order] = 1.0
        return out

    def binary_adjacency(self, dimension: int = DIMENSION,
                         add_identity: bool = True) -> np.ndarray:
        out = np.zeros((dimension, dimension), dtype=np.float32)
        for i, j, _ in self.bonds:
            out[i, j] = out[j, i] = 1.0
        if add_identity:
            out += np.eye(dimension, dtype=np.float32)
            out[out > 0] = 1.0
        return out

    # -- misc -------------------------------------------------------------------

    def to_smiles(self, canonical: bool = True) -> str:
        """Canonical Kekulé SMILES of this molecule (see :mod:`.smiles`)."""
        from .smiles import to_smiles
        return to_smiles(self, canonical=canonical)

    def formula(self) -> str:
        counts: Dict[str, int] = {}
        for z in self.atomic_nums:
            s = periodic.symbol(int(z))
            counts[s] = counts.get(s, 0) + 1
        parts = []
        for s in sorted(counts, key=lambda s: (s != "C", s != "H", s)):
            c = counts[s]
            parts.append(s + (str(c) if c > 1 else ""))
        return "".join(parts)
