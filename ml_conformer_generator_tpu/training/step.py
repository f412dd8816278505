"""Sharded EDM training step: DP (data) x edge-partitioned (edge) SPMD.

One jitted ``shard_map`` program: each device holds a batch shard and a
j-column slab of the edge set, computes the local loss through the
edge-sharded EGNN, and gradients are reduced with ``psum`` over both mesh axes
before a replicated optimiser update. The data axis maps to DCN on multi-host
meshes; the per-layer edge exchange stays on ICI.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DiffusionConfig, EGNNConfig
from ..parallel.edge_shard import dynamics_forward_sharded
from .loss import edm_training_loss


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-12, *,
                   total_steps: int = 0, warmup_steps: int = 0,
                   end_lr_frac: float = 0.1):
    """AdamW; with ``total_steps`` > 0, linear warmup + cosine decay to
    ``lr * end_lr_frac`` (the denoiser's sample quality is sensitive to the
    final-LR noise floor — a constant LR leaves the overfit regime orbiting
    the minimum instead of settling into it)."""
    if total_steps > 0:
        # optax requires decay_steps - warmup_steps > 0; clamp so short
        # runs (small corpora / few epochs) degrade to a shorter warmup
        # instead of raising at startup
        warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr, peak_value=lr,
            warmup_steps=warmup_steps, decay_steps=total_steps,
            end_value=lr * end_lr_frac)
        return optax.adamw(schedule, weight_decay=weight_decay)
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(mesh: Mesh, egnn_cfg: EGNNConfig,
                    diff_cfg: DiffusionConfig, optimizer=None):
    """Build the jitted sharded train step.

    Returns ``step(params, opt_state, key, batch, gamma) ->
    (params, opt_state, metrics)`` where ``batch`` is a dict of
    x (B,N,3), h (B,N,F), node_mask (B,N,1), edge_mask (B,N,N,1),
    context (B,N,C); B must divide the data-axis size and N the edge-axis
    size.

    Per-block rematerialisation is forced on (``EGNNConfig.remat``): the
    un-remat backward stores 9 x (B, N, N, hidden) edge activations and
    OOMs a 16 GB chip at production width already at B=32.
    """
    if optimizer is None:
        optimizer = make_optimizer()
    if not egnn_cfg.remat:
        import dataclasses
        egnn_cfg = dataclasses.replace(egnn_cfg, remat=True)

    n_edge = mesh.shape["edge"]
    n_data = mesh.shape["data"]

    def local_step(params, opt_state, key, x, h, node_mask, edge_mask_l,
                   context, gamma):
        # Decorrelate RNG across data shards; identical across edge shards.
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        def loss_fn(p):
            return edm_training_loss(
                p, key, x, h, node_mask, edge_mask_l, context, gamma,
                egnn_cfg, diff_cfg, dynamics_fn=dynamics_forward_sharded)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        # The forward's psum over 'edge' makes the loss replicated across the
        # edge axis; shard_map's typed AD (varying-manual-axes tracking)
        # transposes the replicated->varying broadcasts into psums, so the
        # local grads are already the full edge-summed gradients. Only the
        # data axis needs an explicit mean (each shard saw different samples).
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean(metrics, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(),                      # params, opt_state, key
                  P("data", None, None),              # x
                  P("data", None, None),              # h
                  P("data", None, None),              # node_mask
                  P("data", None, "edge", None),      # edge_mask
                  P("data", None, None),              # context
                  P()),                               # gamma
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def step(params, opt_state, key, batch, gamma):
        return sharded(params, opt_state, key, batch["x"], batch["h"],
                       batch["node_mask"], batch["edge_mask"],
                       batch["context"], gamma)

    return step

def init_train_state(params, optimizer=None):
    if optimizer is None:
        optimizer = make_optimizer()
    return optimizer.init(params)
