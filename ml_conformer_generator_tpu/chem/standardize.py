"""Molecule standardisation: the validity filter of the generation pipeline.

Behavioural reference: ``/root/reference/src/mlconfgen/utils/standardizer.py``
(``standardize_mol`` :83-111): largest fragment -> kekulise -> normalise ->
sanitise -> optional constrained geometry optimisation; any failure drops the
sample (returns None). That filter passes ~48% of raw samples in the
reference's published numbers.

The geometry optimisation here is the batched on-device force field
(:mod:`.forcefield`) instead of per-molecule CPU MMFF94; use
``standardize_batch`` to amortise it across the whole batch.
"""

from __future__ import annotations

from typing import List, Optional

from .forcefield import optimize_geometry
from .mol import Molecule
from .sanitize import SanitizeError, sanitize


def standardize_mol(mol: Molecule, optimize_geometry_flag: bool = True
                    ) -> Optional[Molecule]:
    """Standardise one molecule; returns None if invalid (reference :83-111)."""
    out = standardize_batch([mol], optimize_geometry_flag)
    return out[0]


def standardize_batch(mols: List[Molecule],
                      optimize_geometry_flag: bool = True,
                      ff_steps: int = 200) -> List[Optional[Molecule]]:
    """Standardise a batch; invalid entries come back as None.

    Valid molecules are geometry-optimised together in one device program.
    """
    cleaned: List[Optional[Molecule]] = []
    valid_idx: List[int] = []
    for k, mol in enumerate(mols):
        try:
            m = mol.largest_fragment()
            m = sanitize(m)
        except (SanitizeError, ValueError):
            cleaned.append(None)
            continue
        cleaned.append(m)
        valid_idx.append(k)

    if optimize_geometry_flag and valid_idx:
        batch = [cleaned[k] for k in valid_idx]
        relaxed = optimize_geometry(batch, n_steps=ff_steps)
        for k, m in zip(valid_idx, relaxed):
            cleaned[k] = m
    return cleaned
