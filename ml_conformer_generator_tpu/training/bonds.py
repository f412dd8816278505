"""Bond-predictor (AdjMatSeer) training: masked cross-entropy on bond types.

The reference ships no training code for its bond predictor (inference-only,
SURVEY.md); this module completes the stack so the framework can produce its
own weights end-to-end. Targets replay the inference-time featurisation
exactly: inputs come from ``chem/featurize.py::prepare_adj_mat_seer_input``
(re-perceived single-bond connectivity, canonical-SMILES writer atom order,
padded distance/adjacency matrices — reference ``mol_utils.py:146-194``), and
the (B, 42, 42, 5) one-hot bond-type targets are the molecules' TRUE bonds
renumbered into that same canonical order, so position statistics match what
the model will see at inference.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..chem.featurize import prepare_adj_mat_seer_input
from ..chem.mol import Molecule
from ..config import AdjMatSeerConfig
from ..models.adj_mat_seer import (adj_mat_seer_forward,
                                   init_adj_mat_seer_params)

__all__ = ["bond_training_batch", "train_adj_mat_seer"]


def bond_training_batch(mols: Sequence[Molecule],
                        cfg: AdjMatSeerConfig = AdjMatSeerConfig()) -> Dict:
    """Featurise molecules WITH known bonds into an AdjMatSeer batch.

    Returns {elements, dist, adj, target, pair_mask}: inputs exactly as the
    inference path builds them, targets as one-hot true bond types in the
    identical canonical order, pair_mask selecting real off-diagonal atom
    pairs (loss is not computed over padding or the diagonal).
    """
    heavy = [m.remove_hs() for m in mols]
    elements, dist, adj, _, orders = prepare_adj_mat_seer_input(
        list(heavy), cfg.dimension, return_orders=True)
    D = cfg.dimension
    target = np.zeros((len(heavy), D, D, cfg.num_bond_types),
                      dtype=np.float32)
    target[..., 0] = 1.0                      # default: "no bond" channel
    pair_mask = np.zeros((len(heavy), D, D), dtype=np.float32)
    for b, m in enumerate(heavy):
        # the IDENTICAL permutation the input featurisation applied (native
        # batched ranks when available) — not an independent recomputation
        true_canon = m.renumber(orders[b])
        for i, j, o in true_canon.bonds:
            t = min(int(o), cfg.num_bond_types - 1)
            target[b, i, j, 0] = target[b, j, i, 0] = 0.0
            target[b, i, j, t] = target[b, j, i, t] = 1.0
        n = m.num_atoms
        pair_mask[b, :n, :n] = 1.0 - np.eye(n, dtype=np.float32)
    return {"elements": elements, "dist": dist, "adj": adj,
            "target": target, "pair_mask": pair_mask}


def train_adj_mat_seer(mols: Sequence[Molecule], *, steps: int = 500,
                       lr: float = 3e-4, batch_size: int = 0, seed: int = 0,
                       cfg: AdjMatSeerConfig = AdjMatSeerConfig(),
                       params=None, log_every: int = 100,
                       log_fn=print) -> Dict:
    """Train AdjMatSeer on molecules with known bonds; returns
    {params, history}. ``batch_size`` 0 trains full-batch (the overfit
    regime); otherwise each step samples a random subset."""
    batch = bond_training_batch(mols, cfg)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    if params is None:
        params = init_adj_mat_seer_params(jax.random.PRNGKey(seed), cfg)

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p, d):
        logits = adj_mat_seer_forward(p, d["elements"], d["dist"], d["adj"],
                                      cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -(d["target"] * logp).sum(-1)          # (B, D, D)
        m = d["pair_mask"]
        return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def step_fn(p, s, d):
        loss, grads = jax.value_and_grad(loss_fn)(p, d)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(seed)
    history: List[Dict] = []
    n = data["elements"].shape[0]
    for step in range(1, steps + 1):
        if batch_size and batch_size < n:
            idx = jnp.asarray(rng.choice(n, size=batch_size, replace=False))
            d = {k: v[idx] for k, v in data.items()}
        else:
            d = data
        params, opt_state, loss = step_fn(params, opt_state, d)
        if step % log_every == 0 or step == steps:
            loss = float(loss)
            history.append({"step": step, "loss": loss})
            log_fn(f"[train-bonds] step {step} loss {loss:.5f}")
    return {"params": params, "history": history}
