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
* the full ChEMBL normalisation table of the reference
  (``standardizer.py:19-43``) in adjacency form — see
  :func:`normalize_charges` for the row-by-row mapping;
* valence checking and implicit hydrogen counting.

The reference's ``flatten_tartrate_mol`` (``standardizer.py:46-59``) removes
chiral tags from tartrate matches; this framework's :class:`~.mol.Molecule`
carries no stereo tags at all, so that transform is a no-op by construction
and intentionally has no code here.
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


def _aromatic_system(mol: Molecule):
    """Build the aromatic (order-4) matching problem.

    Returns ``(arom_atoms, arom_adj, must_match)`` — or ``None`` when the
    molecule has no aromatic bonds. ``must_match[a]`` is True for atoms that
    REQUIRE a pi bond (carbon-like); lone-pair donors (N, O, S, P, anions)
    with room for a double may go either way. Atoms with no valence room for
    a double bond are removed from the adjacency entirely (both directions —
    they can neither seek nor receive a double). Raises SanitizeError for
    over-valent / unkekulisable atoms.
    """
    arom_edges = [(i, j) for i, j, o in mol.bonds if o == 4]
    if not arom_edges:
        return None

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
    no_double: List[int] = []
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
            no_double.append(a)
    for a in no_double:
        arom_adj[a] = []
        for b in arom_adj:
            arom_adj[b] = [x for x in arom_adj[b] if x != a]
    return arom_atoms, arom_adj, must_match


def kekulize(mol: Molecule) -> Molecule:
    """Replace aromatic (order 4) bonds with alternating single/double bonds.

    For each connected aromatic component, finds an assignment of double bonds
    (a matching) such that every aromatic atom that *requires* a pi bond gets
    exactly one. Atoms able to contribute a lone pair instead (N, O, S, P with
    a full single-bond valence) may remain unmatched. Raises SanitizeError if
    no assignment exists.
    """
    system = _aromatic_system(mol)
    if system is None:
        return mol.copy()
    arom_atoms, arom_adj, must_match = system

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


def kekulize_feasible(mol: Molecule, force_matched: Tuple[int, ...] = (),
                      force_unmatched: Tuple[int, ...] = ()) -> bool:
    """Whether a kekulé double-bond matching exists under constraints.

    ``force_matched`` atoms must receive a double bond (pyridine-type role);
    ``force_unmatched`` atoms must not (lone-pair donor / pyrrole-type role).
    Used by the canonical-ranking attached-H invariant to detect aromatic
    N-H placements that the heavy-atom graph FORCES (``chem/canonical.py``
    divergence class 1): e.g. indole's ring N cannot take a double bond (the
    remaining 8 carbons would need a perfect matching over 9 atoms), so it
    is provably pyrrole-type.
    """
    try:
        system = _aromatic_system(mol)
    except SanitizeError:
        return False
    if system is None:
        return not force_matched
    arom_atoms, arom_adj, must_match = system
    arom_adj = {a: list(bs) for a, bs in arom_adj.items()}
    must_match = dict(must_match)
    for a in force_unmatched:
        if must_match.get(a, False):
            return False
        if a in arom_adj:
            arom_adj[a] = []
            for b in arom_adj:
                arom_adj[b] = [x for x in arom_adj[b] if x != a]
    for a in force_matched:
        if not arom_adj.get(a):
            return False
        must_match[a] = True
    try:
        _kekule_matching(arom_atoms, arom_adj, must_match)
        return True
    except SanitizeError:
        return False


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


def _adjacency(mol: Molecule):
    """Per-atom list of (neighbor, order, bond_index)."""
    adj = [[] for _ in range(mol.num_atoms)]
    for bi, (i, j, o) in enumerate(mol.bonds):
        adj[i].append((j, o, bi))
        adj[j].append((i, o, bi))
    return adj


def _bond_in_ring(mol: Molecule, a: int, b: int) -> bool:
    """True if the a-b bond lies in a ring (a reaches b without that bond)."""
    nbrs = mol.neighbors()
    seen = {a}
    stack = [a]
    while stack:
        v = stack.pop()
        for w in nbrs[v]:
            if v == a and w == b:
                continue  # skip the direct bond itself
            if w == b:
                return True
            if w not in seen:
                seen.add(w)
                stack.append(w)
    return False


# Each transform scans the (kekulised) molecule for one motif of the reference
# normalisation table and rewrites it in place, returning True if anything
# changed. All assume neutral-by-default inputs from the bond predictor but
# also handle pre-charged motifs read from files.


def _norm_nitro(out, v, adj) -> bool:
    # Nitro to N+(O-)=O: [N;X3](=[O])=[O] >> [N+]([O-])=O  (standardizer.py:21)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) == 7 and out.charges[a] == 0
                and len(adj[a]) == 3):
            dbl_o = [(b, bi) for b, o, bi in adj[a]
                     if o == 2 and int(out.atomic_nums[b]) == 8]
            if len(dbl_o) >= 2:
                b, bi = dbl_o[0]
                i, j, _ = out.bonds[bi]
                out.bonds[bi] = (i, j, 1)
                out.charges[b] = -1
                out.charges[a] = 1
                return True
    return False


def _norm_diazonium(out, v, adj) -> bool:
    # Diazonium N: [*]-[N;X2]#[N;X1] >> [*]-[N+]#N  (standardizer.py:22)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) == 7 and out.charges[a] == 0
                and len(adj[a]) == 2):
            orders = sorted(o for _, o, _ in adj[a])
            triple = [b for b, o, _ in adj[a]
                      if o == 3 and int(out.atomic_nums[b]) == 7
                      and len(adj[b]) == 1]
            if orders == [1, 3] and triple:
                out.charges[a] = 1
                return True
    return False


def _norm_quaternary_n(out, v, adj) -> bool:
    # Quaternary N: [N;X4;v4;+0] >> [N+]  (standardizer.py:23)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) == 7 and out.charges[a] == 0
                and len(adj[a]) == 4 and v[a] == 4):
            out.charges[a] = 1
            return True
    return False


def _norm_trivalent_o(out, v, adj) -> bool:
    # Trivalent O: [*]=[O;X2;v3;+0]-[#6] >> [*]=[O+]-[C]  (standardizer.py:24)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) == 8 and out.charges[a] == 0
                and len(adj[a]) == 2 and v[a] == 3):
            has_dbl = any(o == 2 for _, o, _ in adj[a])
            single_c = any(o == 1 and int(out.atomic_nums[b]) == 6
                           for b, o, _ in adj[a])
            if has_dbl and single_c:
                out.charges[a] = 1
                return True
    return False


def _norm_sulfoxide(out, v, adj) -> bool:
    # Sulfoxide to -S+(O-): [!O][S+0;D3](=[O])[!O] >> [*][S+]([O-])[*]
    # plus the pathological [SH1+1;D3](=O) second form (standardizer.py:25-27).
    for a in range(out.num_atoms):
        if int(out.atomic_nums[a]) != 16 or len(adj[a]) != 3:
            continue
        chg = int(out.charges[a])
        dbl_o = [(b, bi) for b, o, bi in adj[a]
                 if o == 2 and int(out.atomic_nums[b]) == 8
                 and out.charges[b] == 0]
        non_o = [b for b, o, _ in adj[a] if int(out.atomic_nums[b]) != 8]
        if len(dbl_o) == 1 and len(non_o) == 2 and chg in (0, 1):
            b, bi = dbl_o[0]
            i, j, _ = out.bonds[bi]
            out.bonds[bi] = (i, j, 1)
            out.charges[b] = -1
            out.charges[a] = 1
            return True
    return False


def _norm_trivalent_s(out, v, adj) -> bool:
    # Trivalent S: [O]=[S;D2;+0]-[#6] >> O=[S+]-C  (standardizer.py:28)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) == 16 and out.charges[a] == 0
                and len(adj[a]) == 2):
            has_dbl_o = any(o == 2 and int(out.atomic_nums[b]) == 8
                            for b, o, _ in adj[a])
            single_c = any(o == 1 and int(out.atomic_nums[b]) == 6
                           for b, o, _ in adj[a])
            if has_dbl_o and single_c:
                out.charges[a] = 1
                return True
    return False


def _norm_amide_tautomer(out, v, adj) -> bool:
    # Bad amide tautomers: [C]([OH1;D1])=;!@[N] >> [C](=O)-[N]
    # (standardizer.py:34-35; the NH1/NH0 split is implicit here because
    # hydrogens are implicit — flipping the bond orders adjusts H counts).
    for a in range(out.num_atoms):
        if int(out.atomic_nums[a]) != 6:
            continue
        oh = [(b, bi) for b, o, bi in adj[a]
              if o == 1 and int(out.atomic_nums[b]) == 8
              and out.charges[b] == 0 and len(adj[b]) == 1]
        dbl_n = [(b, bi) for b, o, bi in adj[a]
                 if o == 2 and int(out.atomic_nums[b]) == 7
                 and out.charges[b] == 0]
        for nb, nbi in dbl_n:
            if oh and not _bond_in_ring(out, a, nb):
                ob, obi = oh[0]
                i, j, _ = out.bonds[obi]
                out.bonds[obi] = (i, j, 2)
                i, j, _ = out.bonds[nbi]
                out.bonds[nbi] = (i, j, 1)
                return True
    return False


def _norm_isolated_halide(out, v, adj) -> bool:
    # Halogen with no neighbors: [F,Cl,Br,I;X0;+0] >> [X-] (standardizer.py:36)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) in (9, 17, 35, 53) and len(adj[a]) == 0
                and out.charges[a] == 0):
            out.charges[a] = -1
            return True
    return False


def _norm_pyridine_oxide(out, v, adj) -> bool:
    # Odd pyridine/pyridazine oxide: [C,N;-;D2,D3]-[N+2;D3]-[O-;D1]
    # >> [*]=[N+]-[O-]  (standardizer.py:37)
    for n in range(out.num_atoms):
        if (int(out.atomic_nums[n]) != 7 or out.charges[n] != 2
                or len(adj[n]) != 3):
            continue
        o_nbr = [(b, bi) for b, o, bi in adj[n]
                 if o == 1 and int(out.atomic_nums[b]) == 8
                 and out.charges[b] == -1 and len(adj[b]) == 1]
        a_nbr = [(b, bi) for b, o, bi in adj[n]
                 if o == 1 and int(out.atomic_nums[b]) in (6, 7)
                 and out.charges[b] == -1 and len(adj[b]) in (2, 3)]
        if o_nbr and a_nbr:
            b, bi = a_nbr[0]
            i, j, _ = out.bonds[bi]
            out.bonds[bi] = (i, j, 2)
            out.charges[b] = 0
            out.charges[n] = 1
            return True
    return False


def _norm_odd_azide(out, v, adj) -> bool:
    # Odd azide: [*][N-][N+]#[N] >> [*][N]=[N+]=[N-]  (standardizer.py:38)
    for a in range(out.num_atoms):
        if (int(out.atomic_nums[a]) != 7 or out.charges[a] != -1
                or len(adj[a]) != 2):
            continue
        for b, o, bi in adj[a]:
            if (o == 1 and int(out.atomic_nums[b]) == 7
                    and out.charges[b] == 1):
                term = [(c, ci) for c, oc, ci in adj[b]
                        if oc == 3 and int(out.atomic_nums[c]) == 7
                        and out.charges[c] == 0 and len(adj[c]) == 1]
                if term:
                    c, ci = term[0]
                    i, j, _ = out.bonds[bi]
                    out.bonds[bi] = (i, j, 2)
                    i, j, _ = out.bonds[ci]
                    out.bonds[ci] = (i, j, 2)
                    out.charges[a] = 0
                    out.charges[c] = -1
                    return True
    return False


_NORMALIZATIONS = (
    _norm_nitro,
    _norm_diazonium,
    _norm_quaternary_n,
    _norm_trivalent_o,
    _norm_sulfoxide,
    _norm_trivalent_s,
    _norm_amide_tautomer,
    _norm_isolated_halide,
    _norm_pyridine_oxide,
    _norm_odd_azide,
)


def normalize_charges(mol: Molecule) -> Molecule:
    """Apply the reference standardiser's normalisation table.

    Adjacency-form equivalents of every active SMIRKS row of
    ``/root/reference/src/mlconfgen/utils/standardizer.py:19-43`` (nitro,
    diazonium, quaternary N, trivalent O, both sulfoxide forms, trivalent S,
    both bad-amide tautomers, isolated halide, odd pyridine/pyridazine oxide,
    odd azide), applied in table order to a fixed point, like RDKit's
    ``Normalizer``. The commented-out "Alkaline oxide" row and the
    stereo-only tartrate flatten (see module docstring) are intentionally
    absent.
    """
    out = mol.copy()
    for _ in range(2 * max(1, out.num_atoms)):  # fixed-point, bounded
        v = explicit_valences(out)
        adj = _adjacency(out)
        if not any(t(out, v, adj) for t in _NORMALIZATIONS):
            break
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


def aromatize(mol: Molecule, max_ring: int = 7) -> Molecule:
    """Perceive aromatic rings and mark their bonds order 4 (kekulize inverse).

    Hueckel-style accounting per candidate ring (sizes 5..``max_ring``, from
    :func:`~.perception.find_rings`): each ring atom contributes 1 pi electron
    if it has a double/triple/aromatic bond to another ring-member atom (endo
    or fused), 0 if its only multiple bond is exocyclic to a non-ring atom
    (quinone carbonyls — sp2 but donating nothing), 2 if it has no multiple
    bond but can donate a lone pair (pyrrole N / furan O / thiophene S,
    ``periodic.PI_ELECTRONS_LONE_PAIR``); an atom with no multiple bond and
    no lone pair (sp3) disqualifies the ring. Rings totalling 4n+2 electrons
    become aromatic. Idempotent; input may be Kekule, aromatic, or mixed —
    any Kekule assignment of the same aromatic system maps to the same
    output, which is what makes the canonical SMILES representation-invariant
    (``chem/smiles.py``).

    The accounting is ring-local: systems aromatic only as a whole (azulene's
    10-electron bicycle) are left Kekule. That is a smaller aromaticity model
    than RDKit's default — fine for the ring systems this generator emits.
    """
    from .perception import find_rings

    if not mol.bonds:
        return mol.copy()
    order = {}
    for i, j, o in mol.bonds:
        order[(i, j)] = order[(j, i)] = o
    rings = [r for r in find_rings(mol, max_size=max_ring) if len(r) >= 5]
    ring_atoms = {a for r in rings for a in r}
    multi = {a: [] for a in range(mol.num_atoms)}
    for i, j, o in mol.bonds:
        if o in (2, 3, 4):
            multi[i].append(j)
            multi[j].append(i)

    aromatic_bonds = set()
    for ring in rings:
        electrons = 0
        ok = True
        for a in ring:
            partners = multi[a]
            # The endo-pi test is deliberately against atoms of ANY ring, not
            # just this one: in fused systems a Kekule assignment can place an
            # atom's double bond in the adjoining ring (naphthalene's second
            # Kekule form puts C8a=C1 in the other ring), and a strictly
            # ring-local test would make aromatisation depend on which Kekule
            # assignment the input carried — breaking the invariance this
            # function exists to provide. Cost: a cross-conjugated bond
            # between two *unfused* rings (fulvalene) also counts as endo;
            # such systems are rejected by the 4n+2 count instead.
            if any(p in ring_atoms for p in partners):
                electrons += 1
            elif partners:
                continue              # exocyclic-only multiple bond: sp2, 0 e
            elif int(mol.atomic_nums[a]) in periodic.PI_ELECTRONS_LONE_PAIR \
                    or int(mol.charges[a]) < 0:
                electrons += 2
            else:
                ok = False            # sp3 centre: ring cannot be aromatic
                break
        if ok and electrons % 4 == 2:
            k = len(ring)
            for t in range(k):
                a, b = ring[t], ring[(t + 1) % k]
                if (a, b) in order:
                    aromatic_bonds.add((min(a, b), max(a, b)))

    out = mol.copy()
    out.bonds = [(i, j, 4 if (min(i, j), max(i, j)) in aromatic_bonds else o)
                 for i, j, o in mol.bonds]
    return out
