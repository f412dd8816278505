"""Fréchet ChemNet Distance (FCD) with a fixed random-weight graph encoder.

Re-implements the reference's FCD research metric
(``/root/reference/research_scripts/ffd_fcd/fcd_chemnet_comparison.py``):
the reference defines a *locally initialised, untrained* "ChemNet-style"
GNN encoder (``MolecularGraphEncoder`` :24-95 — embedding(100->32), three
Kipf-normalised message-passing layers to width 128, mean pooling, 512-dim
output) and computes the Fréchet distance between embedding clouds of two
molecule sets. With untrained eval-mode batch norm (running stats 0/1) the
normalisation layers are identities, so the encoder here is the same network
without them.

TPU-native: the encoder is a single jitted batched program (the reference
embeds one molecule per forward); weights are generated deterministically
from a seed so the metric is reproducible across processes.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.mol import Molecule
from .frechet import frechet_distance

__all__ = ["init_chemnet_params", "chemnet_embeddings", "fcd"]

MAX_ATOMS = 50
ATOM_FEATURES = 32
HIDDEN_DIM = 128
OUTPUT_DIM = 512


def init_chemnet_params(seed: int = 0) -> dict:
    """Deterministic 'untrained' encoder weights (torch default-init-like)."""
    rng = np.random.default_rng(seed)

    def linear(in_f, out_f):
        lim = 1.0 / np.sqrt(in_f)
        return {
            "w": jnp.asarray(rng.uniform(-lim, lim, (in_f, out_f)),
                             jnp.float32),
            "b": jnp.asarray(rng.uniform(-lim, lim, (out_f,)), jnp.float32),
        }

    return {
        "embedding": jnp.asarray(rng.standard_normal((100, ATOM_FEATURES)),
                                 jnp.float32),
        "conv1": linear(ATOM_FEATURES, HIDDEN_DIM),
        "conv2": linear(HIDDEN_DIM, HIDDEN_DIM),
        "conv3": linear(HIDDEN_DIM, HIDDEN_DIM),
        "out": linear(HIDDEN_DIM, OUTPUT_DIM),
    }


@jax.jit
def _encode(params: dict, atomic_nums: jnp.ndarray, adj_norm: jnp.ndarray
            ) -> jnp.ndarray:
    """Batched encoder: (B, M) int atomic numbers, (B, M, M) normalised
    adjacency -> (B, OUTPUT_DIM) embeddings (reference forward :49-95)."""
    x = params["embedding"][atomic_nums]                 # (B, M, F)
    for name in ("conv1", "conv2", "conv3"):
        msg = jnp.einsum("bij,bjf->bif", adj_norm, x)
        x = jax.nn.relu(msg @ params[name]["w"] + params[name]["b"])
    pooled = jnp.mean(x, axis=1)                         # (B, H)
    return pooled @ params["out"]["w"] + params["out"]["b"]


def _graph_data(mols: Sequence[Molecule], max_atoms: int = MAX_ATOMS):
    """Padded atomic numbers + Kipf-normalised adjacency with self-loops
    (reference ``mol_to_graph_data`` :118-177; padding rows participate in
    the mean pool exactly as in the reference)."""
    B = len(mols)
    nums = np.zeros((B, max_atoms), dtype=np.int32)
    adj = np.zeros((B, max_atoms, max_atoms), dtype=np.float32)
    for b, mol in enumerate(mols):
        m = mol.remove_hs()
        n = min(m.num_atoms, max_atoms)
        nums[b, :n] = np.clip(m.atomic_nums[:n], 0, 99)
        for i, j, _ in m.bonds:
            if i < max_atoms and j < max_atoms:
                adj[b, i, j] = adj[b, j, i] = 1.0
        adj[b] += np.eye(max_atoms, dtype=np.float32)
        d = adj[b].sum(axis=1)
        dinv = (d + 1e-8) ** -0.5
        adj[b] = adj[b] * dinv[:, None] * dinv[None, :]
    return jnp.asarray(nums), jnp.asarray(adj)


def chemnet_embeddings(mols: Sequence[Molecule], params: dict = None,
                       batch_size: int = 256) -> np.ndarray:
    """Embed a molecule set as one (or a few) jitted batched programs."""
    if params is None:
        params = init_chemnet_params()
    outs: List[np.ndarray] = []
    for s in range(0, len(mols), batch_size):
        nums, adj = _graph_data(mols[s: s + batch_size])
        outs.append(np.asarray(_encode(params, nums, adj)))
    return np.concatenate(outs) if outs else np.zeros((0, OUTPUT_DIM))


def fcd(mols1: Sequence[Molecule], mols2: Sequence[Molecule],
        seed: int = 0) -> float:
    """Fréchet ChemNet Distance between two molecule sets."""
    params = init_chemnet_params(seed)
    return frechet_distance(chemnet_embeddings(mols1, params),
                            chemnet_embeddings(mols2, params))
