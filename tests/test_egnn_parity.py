"""Per-layer activation parity of the JAX EGNN vs the PyTorch reference.

Strategy (SURVEY.md §4): initialise the JAX params, copy them into the torch
reference modules via the checkpoint name mapping, feed both identical inputs,
and compare. The TPU-first formulation reorders the same linear algebra, so
float32 runs drift through the 9 recurrent coordinate-feedback blocks; parity
is therefore asserted in float64 (tolerance 1e-10, i.e. the math is identical)
plus a float32 sanity bound.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_conformer_generator_tpu.checkpoint import egnn_params_to_torch_names
from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.models.egnn import (
    dynamics_forward, init_egnn_params, pairwise_sq_dist)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

from torch_ref_loader import load_egnn


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def make_torch_dynamics(cfg: EGNNConfig, params, double=True):
    ref = load_egnn()
    dyn = ref.EGNNDynamics(
        in_node_nf=cfg.in_node_nf, context_node_nf=cfg.context_node_nf,
        hidden_nf=cfg.hidden_nf, device=torch.device("cpu"))
    if double:
        dyn = dyn.double()
    state = {k[len("egnn."):]: torch.tensor(np.asarray(v))
             for k, v in egnn_params_to_torch_names(params, cfg).items()}
    missing, unexpected = dyn.egnn.load_state_dict(state, strict=True)
    assert not missing and not unexpected
    return dyn


def _inputs(cfg, B=3, N=12, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    n_nodes = rng.integers(N - 4, N + 1, size=B)
    node_mask, edge_mask = prepare_masks(jnp.asarray(n_nodes), N)
    node_mask = np.asarray(node_mask, dtype=dtype)
    edge_mask = np.asarray(edge_mask, dtype=dtype)
    xh = rng.standard_normal((B, N, 3 + cfg.in_node_nf - 1)).astype(dtype)
    xh = xh * node_mask
    context = rng.standard_normal((B, N, cfg.context_node_nf)).astype(dtype)
    context = context * node_mask
    t = np.full((B,), 0.35, dtype=dtype)
    return xh, t, node_mask, edge_mask, context


def _run_both(cfg, dtype, seed=0):
    params = init_egnn_params(jax.random.PRNGKey(0), cfg,
                              dtype=jnp.float64 if dtype == np.float64
                              else jnp.float32)
    dyn = make_torch_dynamics(cfg, params, double=(dtype == np.float64))
    xh, t, node_mask, edge_mask, context = _inputs(cfg, seed=seed, dtype=dtype)

    fwd = jax.jit(lambda *a: dynamics_forward(*a, cfg=cfg))
    out_jax = fwd(params, jnp.asarray(t), jnp.asarray(xh),
                  jnp.asarray(node_mask), jnp.asarray(edge_mask),
                  jnp.asarray(context))

    B, N, _ = xh.shape
    with torch.no_grad():
        out_torch = dyn(
            torch.tensor(t).reshape(-1, 1), torch.tensor(xh),
            torch.tensor(node_mask),
            torch.tensor(edge_mask.reshape(B * N * N, 1)),
            torch.tensor(context))
    return np.asarray(out_jax), out_torch.numpy()


def test_full_dynamics_parity_f64(x64):
    cfg = EGNNConfig(hidden_nf=32, n_blocks=9)
    ours, ref = _run_both(cfg, np.float64)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-11)


def test_full_dynamics_parity_f32_sane():
    cfg = EGNNConfig(hidden_nf=32, n_blocks=9)
    ours, ref = _run_both(cfg, np.float32)
    # float32 reordering drift through 9 recurrent blocks stays small
    assert np.max(np.abs(ours - ref)) < 2e-2
    assert np.median(np.abs(ours - ref)) < 1e-3


def test_pairwise_sq_dist_matches_coord2diff():
    ref = load_egnn()
    rng = np.random.default_rng(0)
    B, N = 2, 7
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    d = pairwise_sq_dist(jnp.asarray(x))
    edges = ref.EGNNDynamics.get_adj_matrix(N, B, torch.device("cpu"))
    radial, _ = ref.coord2diff(torch.tensor(x.reshape(B * N, 3)), edges)
    np.testing.assert_allclose(np.asarray(d).reshape(-1, 1), radial.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_equivariance_rotation(x64):
    """E(3) equivariance: rotating inputs rotates vel, leaves h invariant."""
    cfg = EGNNConfig(hidden_nf=32, n_blocks=9)
    params = init_egnn_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float64)
    xh, t, node_mask, edge_mask, context = _inputs(cfg, seed=5,
                                                   dtype=np.float64)

    rng = np.random.default_rng(7)
    a = rng.standard_normal((3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    q = jnp.asarray(q)

    fwd = jax.jit(lambda *a: dynamics_forward(*a, cfg=cfg))
    args = (params, jnp.asarray(t))
    tail = (jnp.asarray(node_mask), jnp.asarray(edge_mask),
            jnp.asarray(context))
    out = fwd(*args, jnp.asarray(xh), *tail)
    xh_rot = jnp.concatenate([jnp.asarray(xh[..., :3]) @ q,
                              jnp.asarray(xh[..., 3:])], axis=-1)
    out_rot = fwd(*args, xh_rot, *tail)

    np.testing.assert_allclose(np.asarray(out[..., :3] @ q),
                               np.asarray(out_rot[..., :3]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out[..., 3:]),
                               np.asarray(out_rot[..., 3:]),
                               rtol=1e-8, atol=1e-10)
