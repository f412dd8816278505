"""Distribution-level set metrics: Fréchet Fingerprint Distance (FFD).

Re-implements the reference's FFD research metric
(``/root/reference/research_scripts/ffd_fcd/ffd_comparison.py:19-113``):
the Fréchet distance ``||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))`` between
two sets of molecules embedded as Morgan fingerprints (radius 2, 2048 bits).

TPU-native departures from the reference:

* Fingerprints come from this package's own RDKit-free Morgan implementation
  (``eval/fingerprints.py``).
* The matrix square roots use symmetric eigendecompositions (the covariance
  matrices are symmetrised and ridge-regularised, so ``eigh`` is exact and
  much faster than generic ``scipy.linalg.sqrtm`` Schur iterations) and run
  through jax.numpy so large corpora can be embedded on-device.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from ..chem.canonical import canonical_ranks
from ..chem.mol import Molecule
from .fingerprints import morgan_fingerprint

__all__ = ["ffd", "frechet_distance", "fingerprint_matrix", "identity_key",
           "inchi_analog_key"]

_EPS = 1e-6


def fingerprint_matrix(mols: Sequence[Molecule], radius: int = 2,
                       n_bits: int = 2048, n_jobs: int = 0) -> np.ndarray:
    """Dense (n_mols, n_bits) float64 Morgan fingerprint matrix.

    ``n_jobs > 1`` fingerprints in a thread pool — the analog of the
    reference's ProcessPoolExecutor FFD variant
    (``research_scripts/ffd_fcd/ffd_optimized.py``); ``0`` picks a pool size
    automatically for large sets.
    """
    if n_jobs == 0:
        n_jobs = min(8, max(1, len(mols) // 256))
    if n_jobs > 1 and len(mols) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            fps = list(pool.map(
                lambda m: morgan_fingerprint(m, radius=radius, n_bits=n_bits
                                             ).astype(np.float64), mols))
        return np.stack(fps)
    return np.stack([
        morgan_fingerprint(m, radius=radius, n_bits=n_bits).astype(np.float64)
        for m in mols])


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh."""
    w, q = np.linalg.eigh(a)
    w = np.clip(w, 0.0, None)
    return (q * np.sqrt(w)) @ q.T


def frechet_distance(emb1: np.ndarray, emb2: np.ndarray) -> float:
    """Fréchet distance between two embedding clouds (rows = molecules).

    Matches ``ffd_comparison.py:41-113``: symmetrise covariances, add an
    epsilon ridge, and fall back to a trace-only distance if the square root
    is non-finite.
    """
    if emb1.shape[0] < 2 or emb2.shape[0] < 2:
        raise ValueError("Need at least 2 molecules in each set")
    mu1, mu2 = emb1.mean(axis=0), emb2.mean(axis=0)
    s1 = np.cov(emb1, rowvar=False)
    s2 = np.cov(emb2, rowvar=False)
    d = s1.shape[0]
    s1 = (s1 + s1.T) / 2 + _EPS * np.eye(d)
    s2 = (s2 + s2.T) / 2 + _EPS * np.eye(d)

    diff = mu1 - mu2
    r1 = _sqrtm_psd(s1)
    inter = r1 @ s2 @ r1
    inter = (inter + inter.T) / 2
    cov_sqrt = _sqrtm_psd(inter)
    if not np.isfinite(cov_sqrt).all():
        tr = np.trace(s1) + np.trace(s2)
    else:
        tr = np.trace(s1) + np.trace(s2) - 2.0 * np.trace(cov_sqrt)
    return float(diff @ diff + tr)


def ffd(mols1: Sequence[Molecule], mols2: Sequence[Molecule],
        radius: int = 2, n_bits: int = 2048) -> float:
    """Fréchet Fingerprint Distance between two molecule sets."""
    return frechet_distance(fingerprint_matrix(mols1, radius, n_bits),
                            fingerprint_matrix(mols2, radius, n_bits))


def identity_key(mol: Molecule) -> str:
    """Canonical constitutional identity of a molecule (uniqueness hashing).

    Matches the reference's canonical-SMILES uniqueness protocol
    (``research_scripts/evaluation.py:12-42``): the key is the first-party
    canonical Kekulé SMILES (``chem/smiles.py``), so aromatic and kekulised
    representations of the same molecule share a key. For graphs the
    kekuliser rejects (over-valent aromatic systems), falls back to a
    canonical labelled-graph serialisation over the raw bond orders.
    """
    from ..chem.sanitize import SanitizeError
    from ..chem.smiles import to_smiles
    try:
        return to_smiles(mol)
    except (SanitizeError, ValueError):
        # SanitizeError: unkekulisable aromatic system. ValueError: element
        # outside periodic.SYMBOLS (no SMILES token). Either way the key
        # function stays total via the labelled-graph serialisation.
        pass
    ranks = canonical_ranks(mol)
    order = np.argsort(ranks, kind="stable")
    pos = np.empty_like(order)
    pos[order] = np.arange(len(order))
    atoms = ",".join(
        f"{int(mol.atomic_nums[i])}{int(mol.charges[i]):+d}" for i in order)
    bonds = sorted(
        (min(pos[a], pos[b]), max(pos[a], pos[b]), int(o))
        for a, b, o in mol.bonds)
    return atoms + "|" + ";".join(f"{a}-{b}:{o}" for a, b, o in bonds)


def inchi_analog_key(mol: Molecule) -> str:
    """InChI-analog identity: proton-normalised canonical SMILES + /p layer.

    The reference's uniqueness/novelty protocol keys molecules by standard
    InChI (``Chem.MolToInchi``, ``research_scripts/evaluation.py:12-42``).
    InChI differs from a canonical-SMILES key chiefly through its proton
    layer: removable protons are stripped from the structure and counted in
    ``/p±n``, so different drawings of the same protomer system collapse to
    one string (glycine's zwitterion and neutral form share an InChI; an
    acid and its conjugate base differ ONLY in ``/p``). This function
    reproduces that protonation handling on this pipeline's element set:

    * anionic O/S/N sites with no positively charged neighbour (deprotonated
      acids/amides — the neighbour guard keeps charge-separated groups like
      nitro and N-oxide intact, as InChI does) are re-protonated to neutral
      and counted in ``p``;
    * cationic N/O/S/P sites carrying removable hydrogens under the valence
      model (ammonium, pyridinium, ...) are deprotonated to neutral and
      counted in ``p``; quaternary cations have no proton to remove and keep
      their charge in the structure (InChI's ``/q`` layer analog).

    What still diverges from real InChI — quantified in
    ``tests/test_eval.py`` and documented in PARITY.md — is the mobile-H
    (tautomer) layer: InChI merges e.g. 2-pyridone with 2-hydroxypyridine
    and the two double-bond drawings of an amidinium ion; this key keeps
    them distinct (so uniqueness/novelty counts here are an upper bound on
    the InChI-keyed counts — the key merges fewer representations).
    """
    m = mol.remove_hs()
    charges = m.charges.copy()
    nbr_charge_pos = np.zeros(m.num_atoms, dtype=bool)
    for i, j, _o in m.bonds:
        if charges[j] > 0:
            nbr_charge_pos[i] = True
        if charges[i] > 0:
            nbr_charge_pos[j] = True
    # explicit valence under the 2x half-order model (aromatic counts 1.5)
    v2 = np.zeros(m.num_atoms, dtype=np.int64)
    for i, j, o in m.bonds:
        w = 3 if o == 4 else 2 * o
        v2[i] += w
        v2[j] += w
    p = 0
    from ..chem.sanitize import _max_valence
    for a in range(m.num_atoms):
        z = int(m.atomic_nums[a])
        chg = int(charges[a])
        if chg < 0 and z in (7, 8, 16) and not nbr_charge_pos[a]:
            p += chg           # species has |chg| fewer protons than neutral
            charges[a] = 0
        elif chg > 0 and z in (7, 8, 15, 16):
            vceil = int(v2[a] + 1) // 2
            h_avail = max(0, _max_valence(z, chg) - vceil)
            removed = min(chg, h_avail)
            p += removed       # deprotonate to neutral where H exists
            charges[a] = chg - removed
    m.charges = charges
    base = identity_key(m)
    return base + (f"/p{p:+d}" if p else "")


def uniqueness(mols: Iterable[Molecule],
               corpus_keys: Iterable[str] = ()) -> dict:
    """Uniqueness stats (reference ``evaluation.py:12-42`` semantics).

    Returns unique_within_batch (distinct identities) and unique_vs_corpus
    (molecules whose identity does not appear in ``corpus_keys``). Keys are
    :func:`inchi_analog_key` — the reference counts both by InChI;
    ``corpus_keys`` must be produced by the same function.
    """
    keys: List[str] = [inchi_analog_key(m) for m in mols]
    corpus = set(corpus_keys)
    distinct = set(keys)
    novel = sum(1 for k in keys if k not in corpus)
    return {
        "n": len(keys),
        "unique_within_batch": len(distinct),
        "unique_vs_corpus": novel,
    }
