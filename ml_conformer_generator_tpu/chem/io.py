"""Molecule file I/O: XYZ, MDL molblock (V2000), SDF, PDB.

Replaces the RDKit I/O the reference uses (``Chem.MolFromXYZBlock``,
``Chem.MolToMolBlock``, SDF writers in the app/eval scripts) with a small
pure-Python implementation covering the subset of the formats this pipeline
produces and consumes.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import periodic
from .mol import Molecule

_CHARGE_CODE_TO_VALUE = {0: 0, 1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}
_CHARGE_VALUE_TO_CODE = {v: k for k, v in _CHARGE_CODE_TO_VALUE.items()}


# ---------------------------------------------------------------------------
# XYZ
# ---------------------------------------------------------------------------


def from_xyz_block(block: str) -> Molecule:
    lines = block.strip("\n").split("\n")
    n = int(lines[0].strip())
    name = lines[1].strip() if len(lines) > 1 else ""
    atomic_nums, coords = [], []
    for line in lines[2:2 + n]:
        parts = line.split()
        atomic_nums.append(periodic.atomic_num(parts[0]))
        coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return Molecule(np.array(atomic_nums), np.array(coords), [], name=name)


def to_xyz_block(mol: Molecule) -> str:
    lines = [str(mol.num_atoms), mol.name]
    for s, (x, y, z) in zip(mol.symbols(), mol.coords):
        lines.append(f"{s} {x:.9f} {y:.9f} {z:.9f}")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# MDL molblock (V2000)
# ---------------------------------------------------------------------------


def from_mol_block(block: str) -> Molecule:
    lines = block.split("\n")
    if len(lines) < 4:
        raise ValueError("molblock too short")
    name = lines[0].strip()
    counts = lines[3]
    n_atoms = int(counts[0:3])
    n_bonds = int(counts[3:6])

    atomic_nums, coords, charges = [], [], []
    for k in range(n_atoms):
        line = lines[4 + k]
        x = float(line[0:10])
        y = float(line[10:20])
        z = float(line[20:30])
        sym = line[31:34].strip()
        atomic_nums.append(periodic.atomic_num(sym))
        coords.append([x, y, z])
        code = int(line[36:39]) if len(line) >= 39 and line[36:39].strip() else 0
        charges.append(_CHARGE_CODE_TO_VALUE.get(code, 0))

    bonds = []
    for k in range(n_bonds):
        line = lines[4 + n_atoms + k]
        i = int(line[0:3]) - 1
        j = int(line[3:6]) - 1
        order = int(line[6:9])
        bonds.append((i, j, order))

    # M  CHG lines override the atom-block charge codes.
    explicit_chg = {}
    for line in lines[4 + n_atoms + n_bonds:]:
        if line.startswith("M  CHG"):
            parts = line.split()
            cnt = int(parts[2])
            for c in range(cnt):
                idx = int(parts[3 + 2 * c]) - 1
                explicit_chg[idx] = int(parts[4 + 2 * c])
        if line.startswith("M  END"):
            break
    charges_arr = np.array(charges, dtype=np.int64)
    if explicit_chg:
        charges_arr[:] = 0
        for idx, chg in explicit_chg.items():
            charges_arr[idx] = chg

    return Molecule(np.array(atomic_nums), np.array(coords), bonds,
                    charges_arr, name=name)


def to_mol_block(mol: Molecule, name: Optional[str] = None,
                 program: str = "mcgtpu3D") -> str:
    name = mol.name if name is None else name
    out = [name, f"     {program}", ""]
    out.append(f"{mol.num_atoms:3d}{mol.num_bonds:3d}  0  0  0  0  0  0  0  0999 V2000")
    for s, (x, y, z) in zip(mol.symbols(), mol.coords):
        out.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
    for i, j, order in mol.bonds:
        out.append(f"{i + 1:3d}{j + 1:3d}{order:3d}  0")
    chg = [(idx, int(c)) for idx, c in enumerate(mol.charges) if c != 0]
    for start in range(0, len(chg), 8):
        chunk = chg[start:start + 8]
        line = f"M  CHG{len(chunk):3d}"
        for idx, c in chunk:
            line += f"{idx + 1:4d}{c:4d}"
        out.append(line)
    out.append("M  END")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# PDB (ATOM/HETATM coordinate records)
# ---------------------------------------------------------------------------


def from_pdb_block(block: str) -> Molecule:
    """Read a PDB coordinate block (the app's second accepted input type,
    reference ``streamlit_app/app.py:100-115`` via ``Chem.MolFromPDBBlock``).

    Parses ATOM/HETATM records of the first MODEL: coordinates from columns
    31-54, the element from columns 77-78 (falling back to the atom-name
    field when absent, ignoring leading digits). CONECT records become single
    bonds; most PDB files carry no CONECT for small molecules, which is fine —
    the pipeline only needs heavy-atom coordinates (connectivity is perceived
    from geometry downstream, as the reference's DetermineConnectivity does).
    """
    atomic_nums, coords, serials = [], [], {}
    bonds = set()
    for line in block.split("\n"):
        rec = line[:6].strip()
        if rec in ("ATOM", "HETATM"):
            try:
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
            except (ValueError, IndexError):
                raise ValueError(f"malformed PDB coordinate record: {line!r}")
            elem = line[76:78].strip() if len(line) >= 77 else ""
            if not elem:
                name = line[12:16].strip().lstrip("0123456789")
                # 2-letter element iff both chars of the name's element part
                # are alphabetic and the pair is a known symbol (Cl, Br, ...)
                elem = name[:2].capitalize() if (
                    len(name) >= 2 and name[:2].isalpha()
                    and periodic.is_element(name[:2].capitalize())) \
                    else name[:1].upper()
            atomic_nums.append(periodic.atomic_num(elem.capitalize()))
            coords.append([x, y, z])
            serial = line[6:11].strip()
            if serial:
                serials[serial] = len(atomic_nums) - 1
        elif rec == "CONECT":
            fields = line[6:].split()
            if fields and fields[0] in serials:
                a = serials[fields[0]]
                for f in fields[1:]:
                    if f in serials:
                        b = serials[f]
                        if a != b:
                            bonds.add((min(a, b), max(a, b)))
        elif rec == "ENDMDL":
            break  # first model only
    if not atomic_nums:
        raise ValueError("no ATOM/HETATM records in PDB block")
    return Molecule(np.array(atomic_nums), np.array(coords),
                    [(i, j, 1) for i, j in sorted(bonds)])


# ---------------------------------------------------------------------------
# SDF
# ---------------------------------------------------------------------------


def read_sdf(text: str) -> List[Molecule]:
    # Split on '$$$$' separator LINES, never stripping leading blank lines
    # from a record: the molblock's 4-line header (name/program/comment/
    # counts) legitimately starts with a blank line when the molecule is
    # unnamed, and eating it shifts the counts line (round-trip bug with
    # write_sdf output).
    mols: List[Molecule] = []
    record: List[str] = []

    def flush():
        if not any(line.strip() for line in record):
            return
        chunk = "\n".join(record)
        end = chunk.find("M  END")
        if end != -1:
            mols.append(from_mol_block(chunk[: end + len("M  END")]))

    for line in text.splitlines():
        if line.strip() == "$$$$":
            flush()
            record = []
        else:
            record.append(line)
    flush()
    return mols


def write_sdf(mols: List[Molecule], props: Optional[List[dict]] = None) -> str:
    records = []
    for k, mol in enumerate(mols):
        rec = to_mol_block(mol)
        if props is not None and k < len(props):
            for key, value in props[k].items():
                rec += f">  <{key}>\n{value}\n\n"
        rec += "$$$$\n"
        records.append(rec)
    return "".join(records)


def read_mol_file(path: str) -> Molecule:
    with open(path) as f:
        text = f.read()
    if path.endswith(".xyz"):
        return from_xyz_block(text)
    if path.endswith(".pdb"):
        return from_pdb_block(text)
    return from_mol_block(text)


# ---------------------------------------------------------------------------
# SMILES files (FFD/FCD corpora: one SMILES per line, optional name column)
# ---------------------------------------------------------------------------


def read_smiles_file(path: str, limit: Optional[int] = None,
                     skip_bad: bool = True) -> List[Molecule]:
    """Read a SMILES corpus (the input format of the reference's FFD/FCD
    comparison sets, ``research_scripts/ffd_fcd/*``: ChEMBL/PubChem/ZINC
    exports — one molecule per line, whitespace-separated optional name,
    ``#`` comments). Returns heavy-atom molecules with zero coordinates.
    """
    from .canonical import canonical_ranks, smiles_output_order
    from .sanitize import SanitizeError, aromatize, kekulize
    from .smiles import SmilesError, from_smiles

    mols: List[Molecule] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(None, 1)
            if "," in parts[0]:          # comma-separated export (smiles,name)
                parts = line.split(",", 1)
            smi = parts[0].strip()
            name = parts[1].strip() if len(parts) > 1 else ""
            try:
                m = from_smiles(smi, name=name).remove_hs()
                # Kekulise ON CANONICAL NUMBERING so corpus molecules carry
                # an input-order-independent bond-order representation: a
                # Kekule assignment depends on atom order, and for asymmetric
                # aromatics different assignments are non-isomorphic labelled
                # graphs, which would make the Morgan fingerprints used by
                # FFD/FCD depend on how the corpus happened to write each
                # SMILES (the reference's RDKit aromatic fingerprints are
                # order-invariant). Same normalisation as smiles.to_smiles.
                m = aromatize(m)
                m = m.renumber(smiles_output_order(m, canonical_ranks(m)))
                m.bonds = sorted(
                    (min(i, j), max(i, j), o) for i, j, o in m.bonds)
                m = kekulize(m)
            except (SmilesError, SanitizeError):
                if not skip_bad:
                    raise
                continue
            mols.append(m)
            if limit is not None and len(mols) >= limit:
                break
    return mols
