"""Conformer augmentation: perturb-and-relax copies of a training set.

The reference trains on 229M conformers (``README.md:108-115``) — a corpus
unreachable in this environment. What IS reachable is multiplying the
conformers we have: jitter each molecule's heavy-atom coordinates with
gaussian noise, then clean the geometry back up with the batched restrained
force field (``chem/forcefield.py`` — the same 0.2 A flat-bottom restraint
scheme the reference's standardizer applies, ``utils/standardizer.py:62-80``),
yielding physically reasonable *distinct* conformers of the same molecules.
The whole relaxation runs as one jitted program over the padded batch.

Random rotations are also offered for completeness but are a provable no-op
for THIS model: the EGNN denoiser is exactly E(3)-equivariant and the MOI
conditioning context uses only eigenvalues (rotation-invariant), so the
training loss is invariant under any rigid rotation of a sample — rotating
the data cannot change any gradient beyond float roundoff
(``models/egnn.py`` equivariance tests). Perturbation is the augmentation
that adds information.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..chem.forcefield import optimize_geometry
from ..chem.mol import Molecule

__all__ = ["perturb_and_relax"]


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Haar-uniform rotation matrix (QR of a gaussian, sign-fixed)."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def perturb_and_relax(mols: Sequence[Molecule], n_copies: int = 8,
                      sigma: float = 0.15, seed: int = 0,
                      relax_steps: int = 200, rotate: bool = False,
                      max_batch: int = 512) -> List[Molecule]:
    """Return ``mols`` plus ``n_copies`` perturb-and-relax variants of each.

    Each copy gets i.i.d. gaussian coordinate noise (``sigma`` angstrom
    std — large enough to decorrelate torsions, small enough that the
    restrained relaxation recovers sane bond lengths/angles), then one
    batched FIRE relaxation restores local geometry. ``rotate`` additionally
    applies a Haar-random rigid rotation per copy (no-op for the equivariant
    loss; see module docstring).
    """
    rng = np.random.default_rng(seed)
    perturbed: List[Molecule] = []
    for m in mols:
        base = m.remove_hs()
        for _ in range(n_copies):
            p = base.copy()
            coords = base.coords + rng.normal(scale=sigma,
                                              size=base.coords.shape)
            if rotate:
                coords = coords @ _random_rotation(rng).T
            p.coords = coords
            perturbed.append(p)
    relaxed: List[Molecule] = []
    for s in range(0, len(perturbed), max_batch):
        relaxed.extend(optimize_geometry(perturbed[s: s + max_batch],
                                         n_steps=relax_steps))
    return list(mols) + relaxed
