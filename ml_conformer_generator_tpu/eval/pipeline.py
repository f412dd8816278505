"""Sample evaluation: chemical + shape similarity against a reference.

Behavioural reference: ``/root/reference/src/mlconfgen/cheminformatics/
pipeline.py`` (``evaluate_samples`` :17-96). Same contract — returns the
reference molblock in its principal frame and, per sample, the aligned
molblock with shape and chemical Tanimoto scores — but the shape scoring of
all samples and all four principal-frame orientations runs as ONE batched JAX
program instead of a per-(sample, rotation) host loop.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..chem.io import to_mol_block
from ..chem.mol import Molecule
from .fingerprints import morgan_fingerprint, tanimoto
from .shape import FLIP_SIGNS, shape_quadrupole, tanimoto_batch


def evaluate_samples(reference: Molecule, samples: List[Molecule],
                     n_grid: int = 40) -> Tuple[str, List[Dict]]:
    """Score generated samples against a reference conformer.

    Returns ``(reference_molblock, results)`` where each result dict has
    ``mol_block`` (sample aligned to its best principal-frame orientation),
    ``shape_tanimoto`` and ``chemical_tanimoto`` — the reference contract
    (``cheminformatics/pipeline.py:88-96``).
    """
    reference = reference.remove_hs()
    fp_ref = morgan_fingerprint(reference)

    ref_coords = reference.coords - reference.coords.mean(axis=0)
    _, ref_frame = shape_quadrupole(ref_coords)
    pf_reference = reference.copy()
    pf_reference.coords = np.asarray(ref_frame)
    ref_mol_block = to_mol_block(pf_reference)

    if not samples:
        return ref_mol_block, []

    # Host: principal frames (vectorised clique enumeration per sample).
    # Degenerate geometries (coincident atoms from an undertrained sampler)
    # can make the quadrupole eigendecomposition fail or go non-finite; such
    # samples keep their centred coordinates and score 0 instead of killing
    # the whole screen (the reference's per-sample loop would raise too —
    # robustness deviation, not a scoring change for valid geometry).
    stripped = [s.remove_hs() for s in samples]
    frames = []
    degenerate = np.zeros(len(stripped), dtype=bool)
    for k, s in enumerate(stripped):
        c = s.coords - s.coords.mean(axis=0)
        try:
            _, frame = shape_quadrupole(c)
            frame = np.asarray(frame)
            if not np.isfinite(frame).all():
                raise np.linalg.LinAlgError("non-finite frame")
        except np.linalg.LinAlgError:
            frame = np.asarray(c)
            degenerate[k] = True
        frames.append(frame)

    # Device: one batched Tanimoto over samples x 4 orientations.
    n_max = max(f.shape[0] for f in frames)
    B = len(frames)
    cand = np.zeros((B, n_max, 3), dtype=np.float32)
    mask = np.zeros((B, n_max), dtype=np.float32)
    for k, f in enumerate(frames):
        cand[k, : f.shape[0]] = f
        mask[k, : f.shape[0]] = 1.0

    scores = np.asarray(tanimoto_batch(
        jnp.asarray(ref_frame, dtype=jnp.float32),
        jnp.ones(ref_frame.shape[0], dtype=jnp.float32),
        jnp.asarray(cand), jnp.asarray(mask), n_grid=n_grid))  # (B, 4)

    best_flip = np.argmax(scores, axis=1)
    results = []
    for k, s in enumerate(stripped):
        aligned = s.copy()
        coords = frames[k] * FLIP_SIGNS[best_flip[k]][None, :]
        if degenerate[k]:
            # keep the serialized block parseable: a degenerate sample's raw
            # centred coordinates can be NaN or huge (1e20); both overflow
            # the fixed-width f10.4 V2000 coordinate columns (values >= 1e5
            # widen the field and shift every later column), so zero
            # anything non-finite OR out of the format's range
            coords = np.where(np.isfinite(coords) & (np.abs(coords) < 1e4),
                              coords, 0.0)
        aligned.coords = coords
        result = {
            "mol_block": to_mol_block(aligned),
            "shape_tanimoto": (0.0 if degenerate[k]
                               else float(scores[k, best_flip[k]])),
            "chemical_tanimoto": tanimoto(fp_ref, morgan_fingerprint(s)),
        }
        if degenerate[k]:
            result["degenerate"] = True
        results.append(result)
    return ref_mol_block, results
