"""Valence sanitisation, kekulisation, and charge normalisation.

Replaces the RDKit sanitisation the reference relies on
(``Chem.Kekulize`` + ``Chem.SanitizeMol`` + the ChEMBL normalisation SMIRKS in
``utils/standardizer.py:19-43,83-111``). Molecules that cannot be made
chemically sensible raise :class:`SanitizeError`; the standardiser turns that
into a dropped sample — this is the ~50% validity filter of the pipeline.

Implemented:
* kekulisation of aromatic (order-4) bonds via exact matching search per
  aromatic component (pyrrole-type lone-pair atoms may stay unmatched,
  carbon must be matched);
* valence checking against neutral element valences with common charged-state
  fixes mirroring the reference's normalisations (quaternary N+, trivalent O+,
  nitro -> N+(O-)=O, azide, isolated-halogen X-);
* implicit hydrogen counting.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import periodic
from .mol import Molecule


class SanitizeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Kekulisation
# ---------------------------------------------------------------------------


def kekulize(mol: Molecule) -> Molecule:
    """Replace aromatic (order 4) bonds with alternating single/double bonds.

    For each connected aromatic component, finds an assignment of double bonds
    (a matching) such that every aromatic atom that *requires* a pi bond gets
    exactly one. Atoms able to contribute a lone pair instead (N, O, S, P with
    a full single-bond valence) may remain unmatched. Raises SanitizeError if
    no assignment exists.
    """
    arom_edges = [(i, j) for i, j, o in mol.bonds if o == 4]
    if not arom_edges:
        return mol.copy()

    arom_atoms = sorted({a for e in arom_edges for a in e})
    arom_adj: Dict[int, List[int]] = {a: [] for a in arom_atoms}
    for i, j in arom_edges:
        arom_adj[i].append(j)
        arom_adj[j].append(i)

    # Non-aromatic valence already used per atom.
    used = {a: 0 for a in arom_atoms}
    for i, j, o in mol.bonds:
        if o == 4:
            continue
        for a in (i, j):
            if a in used:
                used[a] += o

    must_match: Dict[int, bool] = {}
    for a in arom_atoms:
        z = int(mol.atomic_nums[a])
        chg = int(mol.charges[a])
        n_arom = len(arom_adj[a])
        base = used[a] + n_arom  # valence if all aromatic bonds were single
        max_v = _max_valence(z, chg)
        if base > max_v:
            raise SanitizeError(
                f"atom {a} ({periodic.symbol(z)}) over-valent in aromatic ring")
        can_double = base + 1 <= max_v
        has_lone_pair = z in (7, 8, 15, 16, 34) or chg < 0
        if not can_double and not has_lone_pair:
            raise SanitizeError(
                f"aromatic atom {a} ({periodic.symbol(z)}) cannot kekulise")
        must_match[a] = not has_lone_pair  # C (and similar) must get a double
        if not can_double:
            must_match[a] = False
            arom_adj[a] = []  # cannot participate in a double bond at all

    # Exact search per component (components are small: ring systems).
    double_edges = _kekule_matching(arom_atoms, arom_adj, must_match)

    out = mol.copy()
    new_bonds: List[Tuple[int, int, int]] = []
    for i, j, o in mol.bonds:
        if o != 4:
            new_bonds.append((i, j, o))
        else:
            key = (min(i, j), max(i, j))
            new_bonds.append((i, j, 2 if key in double_edges else 1))
    out.bonds = new_bonds
    return out


def _kekule_matching(atoms, adj, must_match):
    """Backtracking matching: every must_match atom gets exactly one double."""
    matched: Dict[int, Optional[int]] = {a: None for a in atoms}
    chosen: set = set()

    order = sorted((a for a in atoms if must_match[a]),
                   key=lambda a: len(adj[a]))

    def backtrack(idx: int) -> bool:
        while idx < len(order) and matched[order[idx]] is not None:
            idx += 1
        if idx == len(order):
            return True
        a = order[idx]
        for b in adj[a]:
            if matched[b] is None:
                matched[a] = b
                matched[b] = a
                chosen.add((min(a, b), max(a, b)))
                if backtrack(idx + 1):
                    return True
                chosen.discard((min(a, b), max(a, b)))
                matched[a] = None
                matched[b] = None
        return False

    if not backtrack(0):
        raise SanitizeError("kekulisation failed: no valid double-bond pattern")
    return chosen


# ---------------------------------------------------------------------------
# Valence checking + charge normalisation
# ---------------------------------------------------------------------------


def _max_valence(z: int, charge: int) -> int:
    base = max(periodic.DEFAULT_VALENCES.get(z, (4,)))
    if charge == 0:
        return base
    if z == 7:   # N+ -> 4, N- -> 2
        return 4 if charge > 0 else 2
    if z == 8:   # O+ -> 3, O- -> 1
        return 3 if charge > 0 else 1
    if z == 6:
        return 3 if charge != 0 else 4
    if z == 16:
        return 6
    if z in (9, 17, 35, 53) and charge < 0:
        return 0
    return base + abs(charge)


def explicit_valences(mol: Molecule) -> np.ndarray:
    """Sum of integer bond orders per atom (requires kekulised molecule)."""
    v = np.zeros(mol.num_atoms, dtype=np.int64)
    for i, j, o in mol.bonds:
        if o == 4:
            raise SanitizeError("explicit_valences needs a kekulised molecule")
        v[i] += o
        v[j] += o
    return v


def normalize_charges(mol: Molecule) -> Molecule:
    """Apply the common charge normalisations of the reference standardiser.

    Mirrors (in adjacency form) the SMIRKS the reference applies
    (``standardizer.py:19-43``): nitro, quaternary N+, trivalent O+, azide,
    isolated halide anion.
    """
    out = mol.copy()
    v = explicit_valences(out)
    adj = [[] for _ in range(out.num_atoms)]
    for bi, (i, j, o) in enumerate(out.bonds):
        adj[i].append((j, o, bi))
        adj[j].append((i, o, bi))

    for a in range(out.num_atoms):
        z = int(out.atomic_nums[a])
        if z == 7 and v[a] in (4, 5) and out.charges[a] == 0:
            # Nitro N(=O)=O (valence 5) -> N+(-O-)=O
            dbl_o = [(b, bi) for b, o, bi in adj[a]
                     if o == 2 and int(out.atomic_nums[b]) == 8]
            if v[a] == 5 and len(dbl_o) >= 2:
                b, bi = dbl_o[0]
                i, j, _ = out.bonds[bi]
                out.bonds[bi] = (i, j, 1)
                out.charges[b] = -1
                out.charges[a] = 1
                v[a] -= 1
                v[b] -= 1
            elif v[a] == 4:
                # Quaternary / iminium N -> N+
                out.charges[a] = 1
        elif z == 8 and v[a] == 3 and out.charges[a] == 0:
            out.charges[a] = 1
        elif z in (9, 17, 35, 53) and v[a] == 0 and out.charges[a] == 0:
            out.charges[a] = -1
    return out


def implicit_hydrogens(mol: Molecule) -> np.ndarray:
    """Implicit H count per heavy atom = default valence - explicit valence."""
    v = explicit_valences(mol)
    h = np.zeros(mol.num_atoms, dtype=np.int64)
    for a in range(mol.num_atoms):
        z = int(mol.atomic_nums[a])
        chg = int(mol.charges[a])
        if chg == 0:
            allowed = periodic.DEFAULT_VALENCES.get(z, (4,))
            target = next((t for t in allowed if t >= v[a]), None)
        else:
            target = _max_valence(z, chg)
            if v[a] > target:
                target = None
        if target is None:
            raise SanitizeError(
                f"atom {a} ({periodic.symbol(z)}) valence {v[a]} invalid")
        h[a] = target - v[a]
    return h


def sanitize(mol: Molecule) -> Molecule:
    """Kekulise, normalise charges, and validate valences.

    Returns the sanitised molecule; raises SanitizeError when the molecule is
    chemically invalid (the pipeline drops such samples).
    """
    if mol.num_atoms == 0:
        raise SanitizeError("empty molecule")
    m = kekulize(mol)
    m = normalize_charges(m)
    implicit_hydrogens(m)  # raises on invalid valence
    return m
