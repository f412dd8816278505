"""Mesh-sharded generation: the full T-step sampler under shard_map.

For mega-batch regimes (pod-scale virtual screening, BASELINE.json config 5)
the whole reverse-diffusion sampler runs as ONE shard_map program over the
two-level mesh: the sample batch is split along ``data`` and every graph's
(N, N) edge set along ``edge`` (the context-parallel analog,
:mod:`.edge_shard`), with the per-layer j-aggregation completed by ``psum``
over ICI. RNG is folded per data shard, so chips on the same data row draw
identical noise (required: they hold the same samples' different edge slabs)
while different data rows draw independent streams.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DiffusionConfig, EGNNConfig
from ..diffusion.edm import EDMSampler
from .edge_shard import EDGE_AXIS, dynamics_forward_sharded

__all__ = ["ShardedEDMSampler", "make_sharded_generate",
           "make_sharded_inpaint", "make_sharded_merge"]

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class ShardedEDMSampler(EDMSampler):
    """EDMSampler whose denoiser is the edge-sharded EGNN (runs inside
    shard_map; ``edge_mask`` arguments are the local j-column slab)."""

    axis_name: str = EDGE_AXIS

    def phi(self, params, z, t, node_mask, edge_mask_l, context):
        return dynamics_forward_sharded(params, t, z, node_mask, edge_mask_l,
                                        context, self.egnn_cfg,
                                        self.axis_name)


def make_sharded_generate(mesh: Mesh, egnn_cfg: EGNNConfig,
                          diff_cfg: DiffusionConfig, resample_steps: int = 0):
    """Build a jitted sharded sampler.

    Returns ``fn(params, key, gamma, node_mask, edge_mask, context) ->
    (x, h)`` taking GLOBAL arrays: node_mask (B, N, 1),
    edge_mask (B, N, N, 1), context (B, N, C); B must divide the data-axis
    size and N the edge-axis size.
    """
    sampler = ShardedEDMSampler(egnn_cfg, diff_cfg)

    def local_fn(params, key, gamma, node_mask, edge_mask_l, context):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return sampler.generate(params, key, gamma, node_mask, edge_mask_l,
                                context, resample_steps=resample_steps)

    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS, None, EDGE_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    return jax.jit(shard)


def make_sharded_inpaint(mesh: Mesh, egnn_cfg: EGNNConfig,
                         diff_cfg: DiffusionConfig, resample_steps: int = 1,
                         blend_power: int = 3):
    """Sharded fragment inpainting (reference ``equivariant_diffusion.py:423``).

    Returns ``fn(params, key, gamma, node_mask, edge_mask, context, z_known,
    fixed_mask) -> (x, h)`` over GLOBAL arrays; sharding as in
    :func:`make_sharded_generate`, with the fragment latent and fixed mask
    batch-sharded along ``data``.
    """
    sampler = ShardedEDMSampler(egnn_cfg, diff_cfg)

    def local_fn(params, key, gamma, node_mask, edge_mask_l, context,
                 z_known, fixed_mask):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return sampler.inpaint(params, key, gamma, node_mask, edge_mask_l,
                               context, z_known, fixed_mask,
                               resample_steps=resample_steps,
                               blend_power=blend_power)

    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS, None, EDGE_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    return jax.jit(shard)


def make_sharded_merge(mesh: Mesh, egnn_cfg: EGNNConfig,
                       diff_cfg: DiffusionConfig, diffusion_level: int = 50,
                       resample_steps: int = 1, blend_power: int = 3):
    """Sharded fragment merging (reference ``equivariant_diffusion.py:515``).

    Returns ``fn(params, key, gamma, node_mask, edge_mask, fixed_mask,
    context, z_known) -> (x, h)`` over GLOBAL arrays (the IFM merge stage).
    """
    sampler = ShardedEDMSampler(egnn_cfg, diff_cfg)

    def local_fn(params, key, gamma, node_mask, edge_mask_l, fixed_mask,
                 context, z_known):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return sampler.merge_fragments(params, key, gamma, node_mask,
                                       edge_mask_l, fixed_mask, context,
                                       z_known,
                                       diffusion_level=diffusion_level,
                                       resample_steps=resample_steps,
                                       blend_power=blend_power)

    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS, None, EDGE_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    return jax.jit(shard)
