"""Periodic-table data for the host-side chemistry layer.

The reference delegates all chemistry to RDKit (C++); this framework ships its
own lightweight chemistry kernel, so element data lives here. Covalent radii
follow Cordero et al. 2008 (the same table RDKit's connectivity-by-distance
uses); valence rules follow standard organic-chemistry defaults restricted to
the element set the models emit (H + C, N, O, F, P, S, Cl, Br).
"""

from __future__ import annotations

from typing import Dict, Tuple

SYMBOLS: Dict[int, str] = {
    1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 14: "Si", 15: "P",
    16: "S", 17: "Cl", 33: "As", 34: "Se", 35: "Br", 53: "I",
    # Counterions / metals appearing in SMILES corpora (salt forms): carried
    # through I/O and identity keys; the model featurisation layer
    # (ELEMENTS_TO_CLASS) still filters to the generator's element set.
    3: "Li", 11: "Na", 12: "Mg", 13: "Al", 19: "K", 20: "Ca", 25: "Mn",
    26: "Fe", 29: "Cu", 30: "Zn", 47: "Ag", 56: "Ba",
}
ATOMIC_NUMS: Dict[str, int] = {v: k for k, v in SYMBOLS.items()}

#: Covalent radii in Angstrom (Cordero 2008; C is sp3 value).
COVALENT_RADII: Dict[int, float] = {
    1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57, 14: 1.11,
    15: 1.07, 16: 1.05, 17: 1.02, 33: 1.19, 34: 1.20, 35: 1.20, 53: 1.39,
}

#: Standard atomic masses.
ATOMIC_MASSES: Dict[int, float] = {
    1: 1.008, 5: 10.81, 6: 12.011, 7: 14.007, 8: 15.999, 9: 18.998,
    14: 28.085, 15: 30.974, 16: 32.06, 17: 35.45, 33: 74.922, 34: 78.971,
    35: 79.904, 53: 126.904,
}

#: Allowed total bond-order valences per neutral element (sorted ascending).
DEFAULT_VALENCES: Dict[int, Tuple[int, ...]] = {
    1: (1,),
    5: (3,),
    6: (4,),
    7: (3,),
    8: (2,),
    9: (1,),
    14: (4,),
    15: (3, 5),
    16: (2, 4, 6),
    17: (1,),
    33: (3, 5),
    34: (2, 4, 6),
    35: (1,),
    53: (1, 3, 5),
}

#: Max valence including common charged states (+1 for N gives 4, etc.).
MAX_VALENCE_WITH_CHARGE: Dict[int, int] = {
    1: 1, 5: 4, 6: 4, 7: 4, 8: 3, 9: 1, 14: 4, 15: 5, 16: 6, 17: 1,
    33: 5, 34: 6, 35: 1, 53: 5,
}

#: Electronegative elements that commonly carry negative charge.
ELECTRONEGATIVE = frozenset({7, 8, 9, 16, 17, 35})

#: Pi-electron contributions for simple Hueckel aromaticity accounting.
#: (element -> electrons contributed by a ring atom with no exocyclic double
#: bond). Must cover every element the SMILES parser accepts in aromatic form
#: (``smiles._AROMATIC_OK``) and every lone-pair donor the kekuliser accepts
#: (``sanitize.kekulize``): pyrrole N, furan O, thiophene S, phosphole P,
#: selenophene Se. Otherwise aromatize cannot re-perceive a ring the parser
#: produced and identity keys stop being representation-invariant.
PI_ELECTRONS_LONE_PAIR = {7: 2, 8: 2, 15: 2, 16: 2, 34: 2}


def covalent_radius(z: int) -> float:
    return COVALENT_RADII.get(z, 1.5)


def symbol(z: int) -> str:
    try:
        return SYMBOLS[z]
    except KeyError as e:
        raise ValueError(f"Unsupported atomic number {z}") from e


def is_element(sym: str) -> bool:
    return sym in ATOMIC_NUMS


def atomic_num(sym: str) -> int:
    s = sym.strip()
    s = s[0].upper() + s[1:].lower() if len(s) > 1 else s.upper()
    try:
        return ATOMIC_NUMS[s]
    except KeyError as e:
        raise ValueError(f"Unsupported element symbol {sym!r}") from e
