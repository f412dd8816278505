"""Training data pipeline: molecule files -> padded device batches.

The reference ships no training code at all (SURVEY.md: inference-only); this
framework's training stack needs a loader, so this module provides one,
TPU-shaped: fixed padded shapes (bucketed node axis -> no recompiles),
zero-CoM positions, one-hot atom classes, per-molecule principal-MOI context
(the same conditioning the generator uses at inference,
``ops/moi.get_context_shape``), and a background prefetch thread that keeps
host featurisation off the device critical path.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import (CONTEXT_NORMS, ELEMENTS_TO_CLASS, MAX_N_NODES,
                      MIN_N_NODES, NUM_ATOM_CLASSES)
from ..chem.io import read_sdf
from ..chem.mol import Molecule

__all__ = ["MoleculeDataset", "batches", "prefetch"]


class MoleculeDataset:
    """In-memory molecule set with filtering + featurisation.

    Molecules outside [min_n_nodes, max_n_nodes] heavy atoms or with elements
    the model cannot emit are dropped (the generator's constants,
    ``config.py``).
    """

    def __init__(self, mols: Sequence[Molecule],
                 min_n_nodes: int = MIN_N_NODES,
                 max_n_nodes: int = MAX_N_NODES):
        self.mols: List[Molecule] = []
        for mol in mols:
            m = mol.remove_hs()
            if not (min_n_nodes <= m.num_atoms <= max_n_nodes):
                continue
            if any(int(z) not in ELEMENTS_TO_CLASS for z in m.atomic_nums):
                continue
            self.mols.append(m)
        self.max_n_nodes = max_n_nodes

    @classmethod
    def from_sdf(cls, path: str, **kw) -> "MoleculeDataset":
        with open(path) as f:
            return cls(read_sdf(f.read()), **kw)

    def __len__(self) -> int:
        return len(self.mols)

    def featurize(self, indices: Sequence[int], n_pad: int
                  ) -> Dict[str, np.ndarray]:
        """Padded batch dict: x (B,N,3) zero-CoM f32, h (B,N,C) one-hot,
        node_mask (B,N,1), edge_mask (B,N,N,1), context (B,N,3) normalised."""
        B = len(indices)
        N = n_pad
        x = np.zeros((B, N, 3), dtype=np.float32)
        h = np.zeros((B, N, NUM_ATOM_CLASSES), dtype=np.float32)
        node_mask = np.zeros((B, N, 1), dtype=np.float32)
        context = np.zeros((B, N, 3), dtype=np.float32)
        mean = np.asarray(CONTEXT_NORMS["mean"], dtype=np.float32)
        mad = np.asarray(CONTEXT_NORMS["mad"], dtype=np.float32)
        for b, idx in enumerate(indices):
            m = self.mols[idx]
            n = m.num_atoms
            coords = m.coords - m.coords.mean(axis=0)
            x[b, :n] = coords
            for a, z in enumerate(m.atomic_nums):
                h[b, a, ELEMENTS_TO_CLASS[int(z)]] = 1.0
            node_mask[b, :n, 0] = 1.0
            # conditioning: the molecule's own principal MOI (unit masses)
            d2 = (coords ** 2).sum(axis=1)
            moi = np.eye(3) * d2.sum() - coords.T @ coords
            eig = np.sort(np.linalg.eigvalsh(moi)).astype(np.float32)
            context[b, :n] = (eig - mean) / mad
        edge_mask = node_mask[:, :, None, 0:1] * node_mask[:, None, :, 0:1]
        eye = np.eye(N, dtype=np.float32)[None, :, :, None]
        edge_mask = edge_mask * (1.0 - eye)
        return {"x": x, "h": h, "node_mask": node_mask,
                "edge_mask": edge_mask, "context": context}


def batches(dataset: MoleculeDataset, batch_size: int, *,
            rng: Optional[np.random.Generator] = None,
            n_pad: Optional[int] = None, drop_remainder: bool = True
            ) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of shuffled, padded batches (static shapes throughout)."""
    rng = rng or np.random.default_rng(0)
    n_pad = n_pad or dataset.max_n_nodes
    order = rng.permutation(len(dataset))
    end = (len(order) // batch_size * batch_size if drop_remainder
           else len(order))
    for s in range(0, end, batch_size):
        idx = order[s: s + batch_size]
        if drop_remainder and len(idx) < batch_size:
            break
        yield dataset.featurize(idx.tolist(), n_pad)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue, so host
    featurisation of batch k+1 overlaps device compute of batch k."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
