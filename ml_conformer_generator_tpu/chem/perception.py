"""Structure perception: connectivity from 3D geometry, ring finding.

Replaces RDKit's ``rdDetermineBonds.DetermineConnectivity`` (used by the
reference in ``utils/mol_utils.py:110-126`` to guess single-bond connectivity
before bond-order prediction) with a vectorised covalent-radius criterion, and
provides the ring perception needed by kekulisation/aromaticity handling.
"""

from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np

from . import periodic
from .mol import Molecule

#: Distance tolerance (Angstrom) added to the sum of covalent radii — the same
#: value RDKit's connect-the-dots perception uses.
CONNECTIVITY_TOLERANCE = 0.45


def connectivity_from_distance(atomic_nums: np.ndarray, coords: np.ndarray,
                               tolerance: float = CONNECTIVITY_TOLERANCE
                               ) -> List[Tuple[int, int, int]]:
    """Single-order bonds for every atom pair closer than r_i + r_j + tol."""
    from . import native
    res = native.connectivity_from_distance(atomic_nums, coords, tolerance)
    if res is not None:
        return res
    n = len(atomic_nums)
    radii = np.array([periodic.covalent_radius(int(z)) for z in atomic_nums])
    d = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt(np.sum(d * d, axis=-1))
    cutoff = radii[:, None] + radii[None, :] + tolerance
    ii, jj = np.nonzero((dist < cutoff) & ~np.eye(n, dtype=bool))
    return [(int(i), int(j), 1) for i, j in zip(ii, jj) if i < j]


def determine_connectivity(mol: Molecule,
                           tolerance: float = CONNECTIVITY_TOLERANCE
                           ) -> Molecule:
    """Return a copy of ``mol`` with distance-derived single bonds."""
    out = mol.copy()
    out.bonds = connectivity_from_distance(out.atomic_nums, out.coords,
                                           tolerance)
    return out


# ---------------------------------------------------------------------------
# Ring perception
# ---------------------------------------------------------------------------


def find_rings(mol: Molecule, max_size: int = 8) -> List[List[int]]:
    """Smallest rings through each bond (SSSR-like, bounded size).

    For every bond (i, j), finds the shortest cycle containing it via BFS on
    the graph with that bond removed; deduplicates. Sufficient for the ring
    systems the generator emits (organic rings of size 3-8).
    """
    from . import native
    res = native.find_rings(mol.num_atoms, mol.bonds, max_size)
    if res is not None:
        return res
    adj = mol.neighbors()
    rings: Set[Tuple[int, ...]] = set()
    for i, j, _ in mol.bonds:
        path = _shortest_path(adj, i, j, forbidden_edge=(i, j),
                              max_len=max_size - 1)
        if path is None:
            continue
        ring = path  # path from i to j not using edge (i,j); cycle = path
        if len(ring) <= max_size:
            rings.add(tuple(ring))
    # Deduplicate by atom set
    seen: Set[frozenset] = set()
    out: List[List[int]] = []
    for ring in sorted(rings, key=len):
        fs = frozenset(ring)
        if fs not in seen:
            seen.add(fs)
            out.append(list(ring))
    return out


def _shortest_path(adj: List[List[int]], src: int, dst: int,
                   forbidden_edge: Tuple[int, int], max_len: int):
    """BFS shortest path src -> dst avoiding the given edge; returns node list."""
    from collections import deque

    fa, fb = forbidden_edge
    prev = {src: None}
    q = deque([(src, 0)])
    while q:
        v, depth = q.popleft()
        if depth >= max_len:
            continue
        for w in adj[v]:
            if (v == fa and w == fb) or (v == fb and w == fa):
                continue
            if w in prev:
                continue
            prev[w] = v
            if w == dst:
                path = [w]
                while path[-1] is not None:
                    p = prev[path[-1]]
                    if p is None:
                        break
                    path.append(p)
                return path[::-1]
            q.append((w, depth + 1))
    return None


def ring_membership(mol: Molecule, max_size: int = 8) -> List[Set[int]]:
    """Per-atom set of ring ids the atom belongs to."""
    rings = find_rings(mol, max_size)
    member: List[Set[int]] = [set() for _ in range(mol.num_atoms)]
    for rid, ring in enumerate(rings):
        for a in ring:
            member[a].add(rid)
    return member
