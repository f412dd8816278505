"""TPU-native dense-GCN bond-order predictor ("AdjMatSeer").

Behavioural reference: ``/root/reference/src/mlconfgen/adj_mat_seer.py``
(GraphConv :12-57, AdjMatSeer :60-165). The model operates on fixed-size
(B, 42, ...) padded graphs; every op is a batched matmul, which on TPU runs
straight on the MXU — the Kipf-normalised ``D^-1/2 A D^-1/2 @ X W`` is a padded
bmm, the reference's SpMM analog.

Two stacks:
* distance branch: embedding -> 3 GCN layers against the *distance matrix* used
  as a weighted adjacency -> bottleneck to 1 scalar per node;
* main branch: embedding + an FC expansion of that bottleneck -> 4 GCN layers
  against the *binary* adjacency -> per-node (42*5) logits -> reshaped and
  symmetrised to (B, 42, 42, 5) bond-type logits.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AdjMatSeerConfig
from .egnn import np_rng_from_key

Params = Dict[str, Any]


def _linear_init(rng: np.random.Generator, in_f: int, out_f: int,
                 dtype=jnp.float32) -> Params:
    limit = 1.0 / np.sqrt(in_f)
    return {
        "w": jnp.asarray(rng.uniform(-limit, limit, (in_f, out_f)), dtype=dtype),
        "b": jnp.asarray(rng.uniform(-limit, limit, (out_f,)), dtype=dtype),
    }


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def init_adj_mat_seer_params(key, cfg: AdjMatSeerConfig,
                             dtype=jnp.float32) -> Params:
    d, hdim, e = cfg.dimension, cfg.n_hidden, cfg.embedding_dim
    rng = np_rng_from_key(key)
    return {
        "gcn1": _linear_init(rng, e, hdim, dtype),
        "gcn2": _linear_init(rng, hdim, hdim, dtype),
        "gcn3": _linear_init(rng, hdim, hdim, dtype),
        "gcn4": _linear_init(rng, hdim, hdim, dtype),
        "resize": _linear_init(rng, hdim, d * cfg.num_bond_types, dtype),
        "nodes_embedding": jnp.asarray(
            rng.standard_normal((cfg.num_embeddings, e)), dtype=dtype),
        "nodes_coord_fc": _linear_init(rng, d, d * e, dtype),
        "gcn1_dm": _linear_init(rng, e, hdim, dtype),
        "gcn2_dm": _linear_init(rng, hdim, hdim, dtype),
        "gcn3_dm": _linear_init(rng, hdim, hdim, dtype),
        "dm_resize": _linear_init(rng, hdim, 1, dtype),
        "dm_nodes_embedding": jnp.asarray(
            rng.standard_normal((cfg.num_embeddings, e)), dtype=dtype),
    }


def l_norm(adjacency: jnp.ndarray) -> jnp.ndarray:
    """Kipf symmetric normalisation ``D^-1/2 A D^-1/2`` (reference :32-41)."""
    degree = jnp.sum(adjacency, axis=-1)
    inv_sqrt = jax.lax.rsqrt(jnp.clip(degree, min=1e-12))
    return inv_sqrt[..., :, None] * adjacency * inv_sqrt[..., None, :]


def _graph_conv(p: Params, x: jnp.ndarray, ln: jnp.ndarray) -> jnp.ndarray:
    """``l_norm @ (x W + b)`` (reference GraphConv.forward :43-57)."""
    return jnp.einsum("bij,bjh->bih", ln, _linear(p, x))


def adj_mat_seer_forward(params: Params, elements: jnp.ndarray,
                         dist_mat: jnp.ndarray, adj_mat: jnp.ndarray,
                         cfg: AdjMatSeerConfig) -> jnp.ndarray:
    """Forward pass (reference :104-165).

    elements: (B, 42) int atomic numbers (0 = padding);
    dist_mat: (B, 42, 42) padded distance matrix + I;
    adj_mat:  (B, 42, 42) binary adjacency (+ I).
    Returns (B, 42, 42, num_bond_types) symmetrised bond-type logits.
    """
    relu = jax.nn.relu

    # --- distance-matrix branch ---
    dm_emb = jnp.take(params["dm_nodes_embedding"], elements, axis=0)
    dm_ln = l_norm(dist_mat)
    c = relu(_graph_conv(params["gcn1_dm"], dm_emb, dm_ln))
    c = relu(_graph_conv(params["gcn2_dm"], c, dm_ln))
    c = relu(_graph_conv(params["gcn3_dm"], c, dm_ln))
    emb = _linear(params["dm_resize"], c)[..., 0]             # (B, 42) bottleneck

    # --- main branch ---
    nodes_emb = jnp.take(params["nodes_embedding"], elements, axis=0)
    B = elements.shape[0]
    weighted = _linear(params["nodes_coord_fc"], emb).reshape(
        B, cfg.dimension, cfg.embedding_dim)
    merged = nodes_emb + weighted

    ln = l_norm(adj_mat)
    c = relu(_graph_conv(params["gcn1"], merged, ln))
    c = relu(_graph_conv(params["gcn2"], c, ln))
    c = relu(_graph_conv(params["gcn3"], c, ln))
    c = relu(_graph_conv(params["gcn4"], c, ln))

    logits = _linear(params["resize"], c).reshape(
        B, cfg.dimension, cfg.dimension, cfg.num_bond_types)
    return logits + jnp.swapaxes(logits, 1, 2)
