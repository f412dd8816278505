"""First-party SMILES writer / parser (RDKit-free).

The reference leans on RDKit SMILES in two places this framework must match
without RDKit: canonical SMILES as the uniqueness key of the evaluation
protocol (``/root/reference/research_scripts/evaluation.py:12-42``) and
SMILES corpora (ChEMBL / PubChem / ZINC) as the comparison sets of the
FFD/FCD research scripts (``/root/reference/research_scripts/ffd_fcd/*``).

Writer (:func:`to_smiles`)
    Emits canonical **Kekulé** SMILES: atoms are renumbered into the
    package's canonical output order (``canonical.smiles_output_order`` —
    Morgan-refined ranks + writer DFS), aromatic (order-4) bonds are then
    kekulised deterministically on that canonical numbering, and the string
    is produced by a DFS that prefers ascending canonical index. The string
    is therefore a pure function of the labelled molecular graph —
    permutation-invariant, suitable as a uniqueness key. (It will generally
    differ character-for-character from RDKit's canonical form, which uses
    lowercase aromatic notation and RDKit's own tie-breaking; parity is at
    the identity level, not the string level.)

Parser (:func:`from_smiles`)
    Full organic-subset grammar: bare and bracket atoms (charge, explicit H
    count, isotope accepted-and-ignored), aromatic lowercase forms, ring
    closures (``%nn`` included), branches, all bond symbols (``/`` and ``\\``
    accepted as single bonds — this framework carries no stereo), and ``.``
    fragment separators. Aromatic bonds parse to order 4; aromatic bonds
    that turn out not to lie in a ring (e.g. the biphenyl inter-ring bond
    written without an explicit ``-``) are demoted to single. Explicit
    bracket H counts are materialised as real H atoms so nothing is lost;
    implicit hydrogens of bare organic-subset atoms are NOT materialised
    (the pipeline operates on heavy-atom graphs — strip with
    ``remove_hs()`` either way). Parsed molecules have zero coordinates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import periodic
from .canonical import canonical_ranks, smiles_output_order
from .mol import Bond, Molecule

__all__ = ["to_smiles", "from_smiles", "SmilesError"]

#: Elements writable without brackets when neutral (the SMILES organic
#: subset, restricted to elements this chemistry knows valences for).
_ORGANIC_SUBSET = {5: "B", 6: "C", 7: "N", 8: "O", 15: "P", 16: "S",
                   9: "F", 17: "Cl", 35: "Br", 53: "I"}
_AROMATIC_OK = {5, 6, 7, 8, 15, 16, 34}

_BOND_CHAR = {1: "", 2: "=", 3: "#", 4: ":"}
_CHAR_BOND = {"-": 1, "=": 2, "#": 3, ":": 4, "/": 1, "\\": 1}


class SmilesError(ValueError):
    """Raised on malformed SMILES input."""


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _implicit_h_count(z: int, charge: int, sigma: int) -> int:
    """Hydrogens implied on a bracket atom: fill to the smallest allowed
    valence (charge-shifted for the common N+/O+/S+ cations and anions)."""
    base = periodic.DEFAULT_VALENCES.get(z, (sigma,))
    if charge > 0 and z in (5, 7, 8, 15, 16):
        cands = [v + charge for v in base]
    elif charge < 0:
        cands = [v + charge for v in base]  # charge is negative: lowers it
    else:
        cands = list(base)
    for v in cands:
        if v >= sigma:
            return v - sigma
    return 0


def _atom_token(z: int, charge: int, sigma: int) -> str:
    sym = periodic.symbol(z)
    if charge == 0 and z in _ORGANIC_SUBSET:
        return _ORGANIC_SUBSET[z]
    h = _implicit_h_count(z, charge, sigma) if z != 1 else 0
    tok = sym
    if h == 1:
        tok += "H"
    elif h > 1:
        tok += f"H{h}"
    if charge == 1:
        tok += "+"
    elif charge == -1:
        tok += "-"
    elif charge > 1:
        tok += f"+{charge}"
    elif charge < -1:
        tok += f"-{-charge}"
    return f"[{tok}]"


def to_smiles(mol: Molecule, canonical: bool = True) -> str:
    """Kekulé SMILES of ``mol`` (canonical by default — see module doc)."""
    if mol.num_atoms == 0:
        return ""
    m = mol
    if canonical:
        # Normalise the bond-order representation first: any Kekule
        # assignment of an aromatic system maps to the same aromatic graph,
        # so the canonical ranks (and hence the string) cannot depend on
        # which assignment the input happened to carry.
        from .sanitize import aromatize
        m = aromatize(m)
        m = m.renumber(smiles_output_order(m, canonical_ranks(m)))
        # Normalise the bond list (orient i<j, sort): kekulisation and DFS
        # below must depend only on the canonical labelled graph, not on the
        # order bonds happened to be stored in.
        m.bonds = sorted((min(i, j), max(i, j), o) for i, j, o in m.bonds)
    if any(o == 4 for _, _, o in m.bonds):
        from .sanitize import kekulize
        m = kekulize(m)

    n = m.num_atoms
    order_of: Dict[Tuple[int, int], int] = {}
    adj: List[List[int]] = [[] for _ in range(n)]
    for i, j, o in m.bonds:
        adj[i].append(j)
        adj[j].append(i)
        order_of[(i, j)] = order_of[(j, i)] = o
    for nb in adj:
        nb.sort()
    sigma = [sum(order_of[(a, b)] for b in adj[a]) for a in range(n)]

    # One ascending-index DFS per fragment builds the spanning tree (children
    # lists) and classifies back edges as ring closures; emission then walks
    # that same tree, so branch parentheses wrap exactly the non-final tree
    # children. Closure digits are allocated smallest-free and reused.
    visited = [False] * n
    children: List[List[int]] = [[] for _ in range(n)]
    ring_at: Dict[int, List[Tuple[int, int]]] = {a: [] for a in range(n)}
    free_digits: List[int] = []
    next_digit = 1

    def classify(root: int) -> None:
        """Iterative DFS: fill children[] and assign ring-closure digits."""
        nonlocal next_digit
        visited[root] = True
        seen_edges: set = set()
        stack = [(root, iter(adj[root]))]
        parent = {root: -1}
        while stack:
            a, it = stack[-1]
            for b in it:
                if not visited[b]:
                    visited[b] = True
                    parent[b] = a
                    children[a].append(b)
                    stack.append((b, iter(adj[b])))
                    break
                if parent.get(a) != b:
                    key = (min(a, b), max(a, b))
                    if key not in seen_edges:
                        seen_edges.add(key)
                        if free_digits:
                            d = min(free_digits)
                            free_digits.remove(d)
                        else:
                            d = next_digit
                            next_digit += 1
                        ring_at[a].append((b, d))
                        ring_at[b].append((a, d))
            else:
                stack.pop()

    def emit(root: int) -> str:
        """Iterative tree walk (no recursion: corpus molecules can be long
        chains), emitting atom tokens, ring-closure digits, and branch
        parentheses around every non-final tree child."""
        out: List[str] = []
        opened: set = set()
        stack: List[Tuple[str, int]] = [("atom", root)]
        while stack:
            op, a = stack.pop()
            if op == "text":
                out.append(a)  # type: ignore[arg-type]
                continue
            out.append(_atom_token(int(m.atomic_nums[a]),
                                   int(m.charges[a]), sigma[a]))
            for b, d in sorted(ring_at[a], key=lambda t: t[1]):
                key = (min(a, b), max(a, b))
                digit = str(d) if d < 10 else f"%{d:02d}"
                if key not in opened:
                    opened.add(key)
                    out.append(_BOND_CHAR[order_of[(a, b)]] + digit)
                else:
                    out.append(digit)
                    free_digits.append(d)
            kids = children[a]
            for idx in range(len(kids) - 1, -1, -1):
                b = kids[idx]
                sym = _BOND_CHAR[order_of[(a, b)]]
                if idx < len(kids) - 1:
                    stack.append(("text", ")"))
                    stack.append(("atom", b))
                    stack.append(("text", "(" + sym))
                else:
                    stack.append(("atom", b))
                    stack.append(("text", sym))
        return "".join(out)

    parts = []
    for a in range(n):
        if not visited[a]:
            classify(a)
            parts.append(emit(a))
    return ".".join(parts)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_TWO_CHAR = ("Cl", "Br")
_BARE = {"B": 5, "C": 6, "N": 7, "O": 8, "P": 15, "S": 16, "F": 9,
         "Cl": 17, "Br": 35, "I": 53}
_BARE_AROM = {"b": 5, "c": 6, "n": 7, "o": 8, "p": 15, "s": 16}


def _parse_bracket(s: str, pos: int) -> Tuple[int, int, int, bool, int]:
    """Parse ``[...]`` starting at ``s[pos] == '['``.

    Returns (new_pos, atomic_num, charge, aromatic, explicit_h).
    """
    end = s.find("]", pos)
    if end < 0:
        raise SmilesError(f"unclosed bracket at {pos}: {s!r}")
    body = s[pos + 1:end]
    k = 0
    while k < len(body) and body[k].isdigit():   # isotope: accepted, ignored
        k += 1
    if k >= len(body):
        raise SmilesError(f"bracket without element: [{body}]")
    aromatic = False
    if body[k].isupper():
        # longest-match against the known element table (two-letter symbols
        # like Na/Cl/Zn before their one-letter prefixes), but never consume
        # a following H-count marker
        sym, k = body[k], k + 1
        if k < len(body) and body[k].islower() \
                and (sym + body[k]) in periodic.ATOMIC_NUMS:
            sym, k = sym + body[k], k + 1
    elif body[k].islower():
        if body[k:k + 2] == "se":
            sym, k, aromatic = "Se", k + 2, True
        elif body[k] in _BARE_AROM:
            sym, k, aromatic = body[k].upper(), k + 1, True
        else:
            raise SmilesError(f"unknown aromatic symbol in [{body}]")
    else:
        raise SmilesError(f"bad bracket atom [{body}]")
    try:
        z = periodic.atomic_num(sym)
    except ValueError as e:
        raise SmilesError(f"unknown element {sym!r} in [{body}]") from e
    while k < len(body) and body[k] == "@":      # stereo: accepted, ignored
        k += 1
        for tag in ("TH", "AL", "SP", "TB", "OH"):
            if body[k:k + len(tag)] == tag:
                k += len(tag)
        while k < len(body) and body[k].isdigit():
            k += 1
    hcount = 0
    if k < len(body) and body[k] in "Hh":
        k += 1
        num = ""
        while k < len(body) and body[k].isdigit():
            num += body[k]
            k += 1
        hcount = int(num) if num else 1
    charge = 0
    if k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        num = ""
        while k < len(body) and body[k].isdigit():
            num += body[k]
            k += 1
        if num:
            charge = sign * int(num)
        else:
            charge = sign
            while k < len(body) and body[k] == body[k - 1]:
                charge += sign
                k += 1
    if k < len(body) and body[k] == ":":         # atom map: accepted, ignored
        k += 1
        while k < len(body) and body[k].isdigit():
            k += 1
    if k != len(body):
        raise SmilesError(f"trailing junk in bracket [{body}]")
    return end + 1, z, charge, aromatic, hcount


def _bond_in_ring(n: int, bonds: List[Bond], bi: int) -> bool:
    """Is bonds[bi] part of a cycle? (reachability without that bond)"""
    i0, j0, _ = bonds[bi]
    adj: List[List[int]] = [[] for _ in range(n)]
    for k, (i, j, _o) in enumerate(bonds):
        if k == bi:
            continue
        adj[i].append(j)
        adj[j].append(i)
    seen = {i0}
    stack = [i0]
    while stack:
        v = stack.pop()
        if v == j0:
            return True
        for w in adj[v]:
            if w not in seen:
                seen.add(w)
                stack.append(w)
    return False


def from_smiles(smiles: str, name: str = "") -> Molecule:
    """Parse ``smiles`` into a :class:`Molecule` (zero coordinates)."""
    s = smiles.strip()
    zs: List[int] = []
    charges: List[int] = []
    aromatic: List[bool] = []
    bonds: List[Bond] = []
    explicit_h: List[int] = []

    prev: Optional[int] = None
    pending: Optional[int] = None      # explicit bond symbol for next bond
    pending_arom = False
    branch: List[Optional[int]] = []
    rings: Dict[int, Tuple[int, Optional[int]]] = {}

    def add_atom(z, charge, arom, h) -> int:
        zs.append(z)
        charges.append(charge)
        aromatic.append(arom)
        explicit_h.append(h)
        return len(zs) - 1

    def bond_order(a: int, b: int, explicit: Optional[int]) -> int:
        if explicit is not None:
            return explicit
        if aromatic[a] and aromatic[b]:
            return 4
        return 1

    def close_ring(digit: int, explicit: Optional[int]) -> None:
        nonlocal prev
        if prev is None:
            raise SmilesError(f"ring closure {digit} before any atom")
        if digit in rings:
            other, obond = rings.pop(digit)
            if explicit is not None and obond is not None \
                    and explicit != obond:
                raise SmilesError(f"conflicting orders on ring bond {digit}")
            o = explicit if explicit is not None else obond
            bonds.append((other, prev, bond_order(other, prev, o)))
        else:
            rings[digit] = (prev, explicit)

    i = 0
    while i < len(s):
        c = s[i]
        if c == "[":
            i, z, chg, arom, h = _parse_bracket(s, i)
            a = add_atom(z, chg, arom, h)
            if prev is not None:
                bonds.append((prev, a, bond_order(prev, a, pending)))
            prev, pending = a, None
            continue
        if s[i:i + 2] in _TWO_CHAR:
            a = add_atom(_BARE[s[i:i + 2]], 0, False, 0)
            if prev is not None:
                bonds.append((prev, a, bond_order(prev, a, pending)))
            prev, pending = a, None
            i += 2
            continue
        if c in _BARE:
            a = add_atom(_BARE[c], 0, False, 0)
            if prev is not None:
                bonds.append((prev, a, bond_order(prev, a, pending)))
            prev, pending = a, None
            i += 1
            continue
        if c in _BARE_AROM:
            a = add_atom(_BARE_AROM[c], 0, True, 0)
            if prev is not None:
                bonds.append((prev, a, bond_order(prev, a, pending)))
            prev, pending = a, None
            i += 1
            continue
        if c in _CHAR_BOND:
            pending = _CHAR_BOND[c]
            i += 1
            continue
        if c.isdigit():
            close_ring(int(c), pending)
            pending = None
            i += 1
            continue
        if c == "%":
            if i + 2 >= len(s) or not s[i + 1:i + 3].isdigit():
                raise SmilesError(f"bad %nn ring closure at {i}")
            close_ring(int(s[i + 1:i + 3]), pending)
            pending = None
            i += 3
            continue
        if c == "(":
            branch.append(prev)
            i += 1
            continue
        if c == ")":
            if not branch:
                raise SmilesError("unbalanced ')'")
            prev = branch.pop()
            i += 1
            continue
        if c == ".":
            prev, pending = None, None
            i += 1
            continue
        raise SmilesError(f"unexpected character {c!r} at {i} in {smiles!r}")

    if branch:
        raise SmilesError("unbalanced '('")
    if rings:
        raise SmilesError(f"unclosed ring closures: {sorted(rings)}")

    # Aromatic bonds must lie in rings; demote strays (biphenyl-style
    # inter-ring bonds between two aromatic atoms) to single.
    for k, (i0, j0, o) in enumerate(bonds):
        if o == 4 and not _bond_in_ring(len(zs), bonds, k):
            bonds[k] = (i0, j0, 1)

    # Materialise explicit bracket hydrogens as real atoms.
    n_heavy = len(zs)
    for a in range(n_heavy):
        for _ in range(explicit_h[a]):
            h_idx = add_atom(1, 0, False, 0)
            bonds.append((a, h_idx, 1))

    return Molecule(np.asarray(zs, dtype=np.int64),
                    np.zeros((len(zs), 3), dtype=np.float64),
                    bonds, np.asarray(charges, dtype=np.int64), name)
