"""Canonical atom ordering (Morgan-style iterative refinement).

The reference canonicalises atom order via RDKit canonical-SMILES output order
(``utils/mol_utils.py:110-126``) so that the bond predictor sees a
deterministic, geometry-independent ordering. This module provides the same
capability with a classic Morgan/invariant-refinement ranking: initial atom
invariants are refined by hashing sorted neighbour ranks until stable, with
deterministic tie-breaking.

The specific order differs from RDKit's (any deterministic canonical order is
equally valid for the pipeline — AdjMatSeer is trained/evaluated on relative
structure, and our parity harness feeds both stacks identically ordered
inputs), but the properties match: permutation-invariant, unique, stable.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .mol import Molecule


def _initial_invariants(mol: Molecule) -> List[tuple]:
    """Degree, bond-order sum, element, charge — geometry-free invariants.

    Plain tuples (not Python hashes) so the ranking is bit-reproducible across
    processes and matches the native C++ implementation exactly
    (``native/chemhost.cpp``).
    """
    deg = [0] * mol.num_atoms
    order_sum = [0] * mol.num_atoms
    for i, j, o in mol.bonds:
        deg[i] += 1
        deg[j] += 1
        order_sum[i] += o
        order_sum[j] += o
    return [(deg[a], order_sum[a], int(mol.atomic_nums[a]),
             int(mol.charges[a])) for a in range(mol.num_atoms)]


def canonical_ranks(mol: Molecule, max_iters: int = 64) -> np.ndarray:
    """Canonical rank per atom (0 = first in canonical order)."""
    n = mol.num_atoms
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    from . import native
    res = native.canonical_ranks(mol.atomic_nums, mol.charges, mol.bonds)
    if res is not None:
        return res
    adj = [[] for _ in range(n)]
    for i, j, o in mol.bonds:
        adj[i].append((j, o))
        adj[j].append((i, o))

    inv = _initial_invariants(mol)
    ranks = _ranks_from_keys(inv)
    for _ in range(max_iters):
        new_inv = []
        for a in range(n):
            neigh = sorted((int(ranks[b]), o) for b, o in adj[a])
            new_inv.append((int(ranks[a]), tuple(neigh)))
        new_ranks = _ranks_from_keys(new_inv)
        if np.array_equal(new_ranks, ranks) or len(set(new_ranks)) == n:
            ranks = new_ranks
            break
        ranks = new_ranks

    # Break remaining ties deterministically (symmetric atoms): lowest current
    # index wins, then re-refine.
    while len(set(ranks.tolist())) < n:
        counts = {}
        for r in ranks:
            counts[int(r)] = counts.get(int(r), 0) + 1
        tied_rank = min(r for r, c in counts.items() if c > 1)
        first = min(a for a in range(n) if ranks[a] == tied_rank)
        keys = [(int(ranks[a]), 0 if a == first else 1, 0) for a in range(n)]
        ranks = _ranks_from_keys(keys)
        for _ in range(max_iters):
            new_inv = []
            for a in range(n):
                neigh = sorted((int(ranks[b]), o) for b, o in adj[a])
                new_inv.append((int(ranks[a]), tuple(neigh)))
            new_ranks = _ranks_from_keys(new_inv)
            if np.array_equal(new_ranks, ranks):
                break
            ranks = new_ranks
    return ranks


def _ranks_from_keys(keys) -> np.ndarray:
    order = sorted(range(len(keys)), key=lambda a: (_key(keys[a]), 0))
    ranks = np.zeros(len(keys), dtype=np.int64)
    rank = 0
    prev = None
    for pos, a in enumerate(order):
        k = _key(keys[a])
        if prev is not None and k != prev:
            rank = pos
        ranks[a] = rank
        prev = k
    return ranks


def _key(k):
    return k if isinstance(k, tuple) else (k,)


def canonicalise(mol: Molecule) -> Molecule:
    """Renumber atoms into canonical order (reference ``canonicalise``).

    If the molecule has no bonds, connectivity is perceived from geometry
    first (as the reference's DetermineConnectivity step does).
    """
    from .perception import determine_connectivity

    work = mol if mol.num_bonds > 0 else determine_connectivity(mol)
    ranks = canonical_ranks(work)
    order = np.argsort(ranks, kind="stable")
    return work.renumber(order.tolist())
