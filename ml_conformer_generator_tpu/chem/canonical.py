"""Canonical atom ordering (Morgan-style refinement + SMILES-writer DFS).

The reference canonicalises atom order via RDKit canonical-SMILES output order
(``utils/mol_utils.py:110-126``) before bond prediction. That order is NOT the
canonical-rank sort: it is the depth-first traversal order of the canonical
SMILES *writer* — rooted at the lowest-rank atom, visiting neighbours in
ascending canonical rank — so consecutive indices are almost always bonded.
AdjMatSeer treats node position as a feature (``nodes_coord_fc`` and the
per-node resize, ``adj_mat_seer.py:92,135-143,154-165``), so its trained
weights saw DFS-ordered inputs; this module emulates that order:

* :func:`canonical_ranks` — Morgan/invariant-refinement ranking (initial
  invariants: degree, bond-order sum, element, charge — on the all-single-bond
  graphs this path sees, these coincide with RDKit's effective invariants),
  deterministic tie-breaking;
* :func:`smiles_output_order` — the writer traversal over those ranks;
* :func:`canonicalise` — renumber into that order.

Exact tie-break parity with RDKit's implementation cannot be verified in this
environment (RDKit is not installable and there is no network access); what is
reproduced is the documented structure of the order — connected DFS, canonical
root, rank-ordered branches — which determines the positional statistics the
trained bond predictor is sensitive to. The order is permutation-invariant,
unique, and stable (tested).
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


def smiles_output_order(mol: Molecule, ranks: np.ndarray = None) -> List[int]:
    """Canonical-SMILES writer traversal order (reference order semantics).

    Emulates the order RDKit reports in ``_smilesAtomOutputOrder``
    (``utils/mol_utils.py:110-126``): for each fragment (fragments taken in
    order of their lowest-rank atom), a depth-first traversal rooted at the
    fragment's lowest-rank atom, visiting neighbours in ascending canonical
    rank; each branch is written completely before the next.
    """
    n = mol.num_atoms
    if ranks is None:
        ranks = canonical_ranks(mol)
    adj = mol.neighbors()
    visited = [False] * n
    order: List[int] = []

    def dfs(root: int) -> None:
        # iterative (long-chain corpus molecules exceed the recursion limit)
        stack = [root]
        while stack:
            a = stack.pop()
            if visited[a]:
                continue
            visited[a] = True
            order.append(a)
            stack.extend(sorted(adj[a], key=lambda b: (int(ranks[b]), b),
                                reverse=True))

    for root in sorted(range(n), key=lambda a: (int(ranks[a]), a)):
        if not visited[root]:
            dfs(root)
    return order


def canonicalise(mol: Molecule) -> Molecule:
    """Renumber atoms into canonical-SMILES output order (reference
    ``canonicalise``, ``utils/mol_utils.py:110-126``).

    If the molecule has no bonds, connectivity is perceived from geometry
    first (as the reference's DetermineConnectivity step does).
    """
    from .perception import determine_connectivity

    work = mol if mol.num_bonds > 0 else determine_connectivity(mol)
    return work.renumber(smiles_output_order(work))
