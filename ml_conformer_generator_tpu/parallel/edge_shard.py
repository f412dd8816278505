"""Edge-partitioned EGNN: the context-parallel analog for molecular graphs.

The EGNN's cost is O(B * N^2) per-edge message work. At mega-batch scale the
(B, N, N) edge set is sharded across chips along the *second node axis* (each
chip owns a j-column slab of every graph), per-edge messages are computed
locally, and the per-node aggregation is completed with a ``psum`` over the
``edge`` mesh axis — the all-to-all boundary exchange of SURVEY.md §2.5/§7,
expressed as an XLA collective riding ICI.

These functions run *inside* ``shard_map`` with::

    in_specs:  params P()            (replicated)
               t, xh, node_mask, context P('data', ...)
               edge_mask P('data', None, 'edge', None)
    out_specs: P('data', ...)

Node-level compute (node MLPs, embeddings) is replicated across the edge axis
— it is O(B*N) and cheaper than communicating activations.

Numerics match :mod:`..models.egnn` exactly up to float reordering of the
j-sum (verified by tests against the dense single-device forward).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EGNNConfig
from ..models.egnn import Params, _linear, remove_mean_with_mask

EDGE_AXIS = "edge"


def _local_cols(x: jnp.ndarray, n_local: int, axis_name: str) -> jnp.ndarray:
    """Slice this shard's j-column slab out of a node-axis array (axis 1)."""
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, idx * n_local, n_local, axis=1)


def _edge_stack_apply_local(p0: Params, p1: Params, h: jnp.ndarray,
                            edge_feat_l: jnp.ndarray, n_local: int,
                            axis_name: str) -> jnp.ndarray:
    """Split-weight 2-layer edge MLP over the local (B, N, N_l) edge slab."""
    hdim = h.shape[-1]
    w_src = p0["w"][:hdim]
    w_tgt = p0["w"][hdim:2 * hdim]
    w_e = p0["w"][2 * hdim:]
    u = h @ w_src                                # (B, N, H) — i rows, all local
    v = _local_cols(h @ w_tgt, n_local, axis_name)   # (B, N_l, H) — j slab
    pre = (u[:, :, None, :] + v[:, None, :, :] + edge_feat_l @ w_e + p0["b"])
    return jax.nn.silu(_linear(p1, jax.nn.silu(pre)))


def gcl_forward_sharded(params: Params, h, edge_feat_l, node_mask,
                        edge_mask_l, nf: float, n_local: int,
                        axis_name: str = EDGE_AXIS):
    mij = _edge_stack_apply_local(params["edge_0"], params["edge_1"], h,
                                  edge_feat_l, n_local, axis_name)
    gate = jax.nn.sigmoid(_linear(params["att"], mij))
    msg = mij * gate * edge_mask_l
    agg = jax.lax.psum(jnp.sum(msg, axis=2), axis_name) / nf
    w = params["node_0"]["w"]
    hdim = h.shape[-1]
    pre = h @ w[:hdim] + agg @ w[hdim:] + params["node_0"]["b"]
    out = h + _linear(params["node_1"], jax.nn.silu(pre))
    return out * node_mask


def coord_update_forward_sharded(params: Params, h, x, edge_feat_l,
                                 coord_diff_l, node_mask, edge_mask_l,
                                 nf: float, n_local: int,
                                 axis_name: str = EDGE_AXIS):
    m = _edge_stack_apply_local(params["coord_0"], params["coord_1"], h,
                                edge_feat_l, n_local, axis_name)
    scal = m @ params["coord_out"]["w"]
    trans = coord_diff_l * scal * edge_mask_l
    agg = jax.lax.psum(jnp.sum(trans, axis=2), axis_name) / nf
    return (x + agg) * node_mask


def _local_geometry(x: jnp.ndarray, n_local: int, axis_name: str
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slab squared distances and unit difference vectors."""
    xj = _local_cols(x, n_local, axis_name)          # (B, N_l, 3)
    diff = x[:, :, None, :] - xj[:, None, :, :]      # (B, N, N_l, 3)
    radial = jnp.sum(diff * diff, axis=-1, keepdims=True)
    coord_diff = diff / jnp.sqrt(radial + 1e-8)
    return radial, coord_diff


def egnn_forward_sharded(params: Params, h, x, node_mask, edge_mask_l,
                         cfg: EGNNConfig, axis_name: str = EDGE_AXIS):
    n_local = edge_mask_l.shape[2]
    d0_l, _ = _local_geometry(x, n_local, axis_name)
    h = _linear(params["embedding"], h)

    def body(carry, block_params):
        h, x = carry
        radial_l, coord_diff_l = _local_geometry(x, n_local, axis_name)
        edge_feat_l = jnp.concatenate([radial_l, d0_l], axis=-1)
        nfac = cfg.normalization_factor
        h = gcl_forward_sharded(block_params["gcl_0"], h, edge_feat_l,
                                node_mask, edge_mask_l, nfac, n_local,
                                axis_name)
        h = gcl_forward_sharded(block_params["gcl_1"], h, edge_feat_l,
                                node_mask, edge_mask_l, nfac, n_local,
                                axis_name)
        x = coord_update_forward_sharded(block_params["coord"], h, x,
                                         edge_feat_l, coord_diff_l, node_mask,
                                         edge_mask_l, nfac, n_local, axis_name)
        h = h * node_mask
        return (h, x), None

    if cfg.remat:
        # training-only (config.py EGNNConfig.remat): without this the
        # backward saves 9 x (B, N, N_local, hidden) edge activations per
        # scan — 19.8 GB at production width/B=32 on one chip (measured
        # OOM); with it only the per-block (h, x) carries persist.
        body = jax.checkpoint(body, prevent_cse=False)
    (h, x), _ = jax.lax.scan(body, (h, x), params["blocks"])
    h = _linear(params["embedding_out"], h) * node_mask
    return h, x


def dynamics_forward_sharded(params: Params, t, xh, node_mask, edge_mask_l,
                             context, cfg: EGNNConfig,
                             axis_name: str = EDGE_AXIS):
    """Edge-sharded EGNNDynamics (same contract as ``dynamics_forward``)."""
    B, N, _ = xh.shape
    nd = cfg.n_dims
    xh = xh * node_mask
    x = xh[..., :nd]
    hfeat = xh[..., nd:]
    t_b = jnp.broadcast_to(jnp.reshape(t, (B, 1, 1)), (B, N, 1))
    h = jnp.concatenate([hfeat, t_b, context], axis=-1)
    h_final, x_final = egnn_forward_sharded(params, h, x, node_mask,
                                            edge_mask_l, cfg, axis_name)
    vel = (x_final - x) * node_mask
    vel = remove_mean_with_mask(vel, node_mask)
    h_out = h_final[..., : -(cfg.context_node_nf + 1)]
    return jnp.concatenate([vel, h_out], axis=-1)
