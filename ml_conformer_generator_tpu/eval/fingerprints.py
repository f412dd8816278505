"""Morgan/ECFP-style circular fingerprints on the framework's Molecule graph.

The reference uses RDKit's Morgan generator (radius 2, 2048 bits,
``cheminformatics/pipeline.py:11-14``) for chemical Tanimoto similarity,
novelty, and the FFD metric. This is an independent implementation of the
same ECFP construction (Rogers & Hahn 2010) over :class:`..chem.mol.Molecule`:
per-atom invariants, iterative neighbourhood hashing, duplicate-environment
removal, folding to a fixed bit width.

Bit assignments are NOT RDKit-compatible (different hash function), but all
downstream quantities are Tanimoto / distribution comparisons *between*
fingerprints from this same generator, for which any stable hash is valid.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Set, Tuple

import numpy as np

from ..chem.mol import Molecule
from ..chem.sanitize import SanitizeError, explicit_valences, implicit_hydrogens

FP_SIZE = 2048
RADIUS = 2


def _hash(values: Tuple[int, ...]) -> int:
    """Stable 64-bit hash of an int tuple (blake2b; independent of PYTHONHASHSEED)."""
    h = hashlib.blake2b(
        struct.pack(f"<{len(values)}Q",
                    *(v & 0xFFFFFFFFFFFFFFFF for v in values)),
        digest_size=8)
    return struct.unpack("<Q", h.digest())[0]


def _initial_invariants(mol: Molecule) -> List[int]:
    """Daylight-style atom invariants: Z, degree, valence, H count, charge, ring."""
    try:
        h_counts = implicit_hydrogens(mol)
    except SanitizeError:
        h_counts = np.zeros(mol.num_atoms, dtype=np.int64)
    try:
        valences = explicit_valences(mol)
    except SanitizeError:  # aromatic bonds present: count order-4 as 1.5*2
        valences = np.zeros(mol.num_atoms, dtype=np.int64)
        for i, j, o in mol.bonds:
            w = 3 if o == 4 else 2 * o
            valences[i] += w
            valences[j] += w
        valences //= 2
    degree = np.zeros(mol.num_atoms, dtype=np.int64)
    in_ring = _ring_membership(mol)
    for i, j, _ in mol.bonds:
        degree[i] += 1
        degree[j] += 1
    return [
        _hash((int(mol.atomic_nums[a]), int(degree[a]), int(valences[a]),
               int(h_counts[a]), int(mol.charges[a]), int(in_ring[a])))
        for a in range(mol.num_atoms)
    ]


def _ring_membership(mol: Molecule) -> np.ndarray:
    """Atoms on any cycle: iteratively prune degree-<=1 vertices."""
    n = mol.num_atoms
    adj = {a: set() for a in range(n)}
    for i, j, _ in mol.bonds:
        adj[i].add(j)
        adj[j].add(i)
    changed = True
    while changed:
        changed = False
        for a in range(n):
            if len(adj[a]) == 1:
                (b,) = adj[a]
                adj[b].discard(a)
                adj[a] = set()
                changed = True
    return np.array([len(adj[a]) > 0 for a in range(n)], dtype=np.int64)


def morgan_environments(mol: Molecule, radius: int = RADIUS) -> Set[int]:
    """All unique circular-environment identifiers up to ``radius``.

    Duplicate environments (same bond set reached at the same or a lower
    radius) are removed, mirroring ECFP's duplicate filtering.
    """
    ids = _initial_invariants(mol)
    neigh: List[List[Tuple[int, int]]] = [[] for _ in range(mol.num_atoms)]
    for i, j, o in mol.bonds:
        neigh[i].append((o, j))
        neigh[j].append((o, i))

    # Environment bond-sets for duplicate removal.
    bond_index = {}
    for bi, (i, j, _) in enumerate(mol.bonds):
        bond_index[(i, j)] = bi
        bond_index[(j, i)] = bi

    features: Set[int] = set(ids)
    env_bonds: List[Set[int]] = [set() for _ in range(mol.num_atoms)]
    seen_keys: Set[frozenset] = set()

    for _ in range(radius):
        new_ids = list(ids)
        new_env = [set(e) for e in env_bonds]
        for a in range(mol.num_atoms):
            pairs = sorted((o, ids[b]) for o, b in neigh[a])
            flat: List[int] = [ids[a]]
            for o, nid in pairs:
                flat.extend((o, nid))
            new_ids[a] = _hash(tuple(flat))
            for o, b in neigh[a]:
                new_env[a].add(bond_index[(a, b)])
                new_env[a] |= env_bonds[b]
        ids, env_bonds = new_ids, new_env
        # Duplicate filtering: one feature per distinct bond-environment,
        # smallest identifier wins within an iteration.
        round_envs = {}
        for a in range(mol.num_atoms):
            key = frozenset(env_bonds[a])
            if key in seen_keys:
                continue
            prev = round_envs.get(key)
            if prev is None or ids[a] < prev:
                round_envs[key] = ids[a]
        seen_keys.update(round_envs)
        features.update(round_envs.values())

    return features


def morgan_fingerprint(mol: Molecule, radius: int = RADIUS,
                       n_bits: int = FP_SIZE) -> np.ndarray:
    """Folded binary fingerprint as a (n_bits,) bool array."""
    fp = np.zeros(n_bits, dtype=bool)
    for f in morgan_environments(mol, radius):
        fp[f % n_bits] = True
    return fp


def tanimoto(fp1: np.ndarray, fp2: np.ndarray) -> float:
    inter = np.count_nonzero(fp1 & fp2)
    union = np.count_nonzero(fp1 | fp2)
    return inter / union if union else 0.0
