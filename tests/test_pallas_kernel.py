"""Parity tests for the fused Pallas edge-MLP kernel (ops/gcl_kernel.py).

The kernel is the TPU production path for the EGNN hot loop (reference
semantics ``/root/reference/src/mlconfgen/egnn.py:38-149``); here it runs in
Pallas interpret mode on CPU and is checked against the pure-XLA dense path
in ``models/egnn.py``, which is itself parity-tested against the torch
reference (tests/test_egnn_parity.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.models.egnn import (coord_update_forward,
                                                    dynamics_forward,
                                                    egnn_forward, gcl_forward,
                                                    init_egnn_params,
                                                    pairwise_sq_dist)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

CFG_OFF = EGNNConfig(hidden_nf=64, n_blocks=2, use_pallas="off")
CFG_ON = dataclasses.replace(CFG_OFF, use_pallas="on")


def _inputs(rng, B=3, N=42, nf=CFG_OFF.total_node_nf):
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(15, 40, size=B)), N)
    h = jnp.asarray(rng.standard_normal((B, N, nf)),
                    jnp.float32) * node_mask
    x = jnp.asarray(rng.standard_normal((B, N, 3)),
                    jnp.float32) * node_mask
    return h, x, node_mask, edge_mask


def test_gcl_forward_matches_xla(rng):
    params = init_egnn_params(jax.random.PRNGKey(0), CFG_OFF)
    h, x, node_mask, edge_mask = _inputs(rng)
    h = jnp.asarray(
        rng.standard_normal((3, 42, CFG_OFF.hidden_nf)),
        jnp.float32) * node_mask
    d0 = pairwise_sq_dist(x)[..., None]
    ef = jnp.concatenate([d0, d0], axis=-1)
    gp = jax.tree_util.tree_map(lambda a: a[0], params["blocks"]["gcl_0"])
    ref = gcl_forward(gp, h, ef, node_mask, edge_mask, 100.0, CFG_OFF)
    out = gcl_forward(gp, h, ef, node_mask, edge_mask, 100.0, CFG_ON)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_coord_update_matches_xla(rng):
    params = init_egnn_params(jax.random.PRNGKey(0), CFG_OFF)
    h, x, node_mask, edge_mask = _inputs(rng)
    h = jnp.asarray(
        rng.standard_normal((3, 42, CFG_OFF.hidden_nf)),
        jnp.float32) * node_mask
    radial = pairwise_sq_dist(x)[..., None]
    ef = jnp.concatenate([radial, radial], axis=-1)
    diff = x[:, :, None, :] - x[:, None, :, :]
    coord_diff = diff / jnp.sqrt(radial + 1e-8)
    cp = jax.tree_util.tree_map(lambda a: a[0], params["blocks"]["coord"])
    ref = coord_update_forward(cp, h, x, ef, coord_diff, node_mask,
                               edge_mask, 100.0, CFG_OFF)
    out = coord_update_forward(cp, h, x, ef, coord_diff, node_mask,
                               edge_mask, 100.0, CFG_ON)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_full_egnn_matches_xla(rng):
    params = init_egnn_params(jax.random.PRNGKey(0), CFG_OFF)
    h, x, node_mask, edge_mask = _inputs(rng)
    h0, x0 = egnn_forward(params, h, x, node_mask, edge_mask, CFG_OFF)
    h1, x1 = egnn_forward(params, h, x, node_mask, edge_mask, CFG_ON)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=3e-5,
                               rtol=1e-4)


def test_dynamics_matches_xla_bf16(rng):
    """bf16 feature path through the kernel stays close to the bf16 XLA path."""
    cfg_off = dataclasses.replace(CFG_OFF, compute_dtype="bfloat16")
    cfg_on = dataclasses.replace(CFG_ON, compute_dtype="bfloat16")
    params = init_egnn_params(jax.random.PRNGKey(0), cfg_off)
    B, N = 2, 42
    node_mask, edge_mask = prepare_masks(jnp.asarray([20, 33]), N)
    xh = jnp.asarray(rng.standard_normal((B, N, 11)),
                     jnp.float32) * node_mask
    ctx = jnp.asarray(rng.standard_normal((B, N, 3)),
                      jnp.float32) * node_mask
    t = jnp.full((B,), 0.4, jnp.float32)
    ref = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg_off)
    out = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg_on)
    # bf16 tolerance: both paths round differently at ~1e-2 granularity.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2,
                               rtol=5e-2)


def test_masked_rows_are_zero(rng):
    params = init_egnn_params(jax.random.PRNGKey(0), CFG_ON)
    h, x, node_mask, edge_mask = _inputs(rng)
    h1, x1 = egnn_forward(params, h, x, node_mask, edge_mask, CFG_ON)
    mask = np.asarray(node_mask)[..., 0] == 0
    assert np.abs(np.asarray(h1)[mask]).max() == 0.0
