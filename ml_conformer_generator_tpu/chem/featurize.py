"""Host-side featurisation between device tensors and molecules.

Behavioural reference: ``/root/reference/src/mlconfgen/utils/mol_utils.py``
(``samples_to_rdkit_mol`` :18-57, ``prepare_adj_mat_seer_input`` :146-194,
``ifm_get_xh_from_fragment`` :345-370).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..config import ATOM_DECODER, DIMENSION
from . import periodic
from .canonical import smiles_output_order
from .mol import Molecule


def samples_to_molecules(positions: np.ndarray, one_hot: np.ndarray,
                         node_mask: np.ndarray,
                         atom_decoder: Dict[int, str] = ATOM_DECODER
                         ) -> List[Molecule]:
    """EDM output tensors -> bond-less molecules (reference :18-57)."""
    positions = np.asarray(positions)
    one_hot = np.asarray(one_hot)
    node_mask = np.asarray(node_mask)
    n_per = node_mask[..., 0].sum(axis=1).astype(int)
    mols = []
    for b in range(positions.shape[0]):
        n = int(n_per[b])
        labels = np.argmax(one_hot[b, :n], axis=-1)
        z = np.array([periodic.atomic_num(atom_decoder[int(c)])
                      for c in labels])
        mols.append(Molecule(z, positions[b, :n].astype(np.float64), []))
    return mols


def prepare_adj_mat_seer_input(mols: List[Molecule],
                               dimension: int = DIMENSION,
                               return_orders: bool = False
                               ) -> Tuple[np.ndarray, ...]:
    """Canonicalise + featurise raw samples for the bond predictor (:146-194).

    Returns (elements (B, D) int, dist_mat (B, D, D) + I,
    binary adjacency (B, D, D) + I, canonicalised molecules); with
    ``return_orders`` also the per-molecule canonical permutation actually
    applied, so callers that need to renumber OTHER per-molecule data (e.g.
    true-bond training targets) use the identical order instead of
    recomputing it through a possibly divergent code path.
    """
    B = len(mols)
    elements = np.zeros((B, dimension), dtype=np.int64)
    dist = np.zeros((B, dimension, dimension), dtype=np.float32)
    adj = np.zeros((B, dimension, dimension), dtype=np.float32)
    eye = np.eye(dimension, dtype=np.float32)

    # Re-perceive connectivity UNCONDITIONALLY — the reference's canonicalise
    # calls rdDetermineBonds.DetermineConnectivity on every input
    # (mol_utils.py:117), replacing any existing bond orders with generic
    # single bonds, so the canonical ranks the bond predictor's ordering is
    # built on always see the all-single graph. Then canonical-rank the
    # whole batch through the native worker pool in one call
    # (chem/native.py); falls back to per-molecule Python ranking.
    from . import native
    from .perception import determine_connectivity
    bonded = [determine_connectivity(m) for m in mols]
    batch_ranks = native.canonical_ranks_batch(bonded)

    canon: List[Molecule] = []
    orders: List[List[int]] = []
    for b, mol in enumerate(bonded):
        ranks = batch_ranks[b] if batch_ranks is not None else None
        order = smiles_output_order(mol, ranks)
        m = mol.renumber(order)
        n = m.num_atoms
        elements[b] = m.elements_vector(dimension)
        dm = m.distance_matrix().astype(np.float32)
        dist[b, :n, :n] = dm
        dist[b] += eye
        adj[b] = m.binary_adjacency(dimension, add_identity=True)
        canon.append(m)
        orders.append(order)
    if return_orders:
        return elements, dist, adj, canon, orders
    return elements, dist, adj, canon


def fragment_to_xh(fragment: Molecule) -> Tuple[np.ndarray, np.ndarray]:
    """Fragment molecule -> (coords (n,3) float32, one-hot (n,8)) (:345-370)."""
    frag = fragment.remove_hs()
    x = frag.coords.astype(np.float32)
    h = frag.one_hot_elements_encoding(frag.num_atoms).astype(np.float32)
    return x, h
