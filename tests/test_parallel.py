"""Multi-device tests on the virtual 8-device CPU mesh: edge-sharded EGNN
parity, sharded training step, and the driver dry-run entry points."""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                    init_egnn_params)
from ml_conformer_generator_tpu.parallel.edge_shard import (
    dynamics_forward_sharded)
from ml_conformer_generator_tpu.parallel.mesh import make_mesh
from ml_conformer_generator_tpu.training.loss import edm_training_loss
from ml_conformer_generator_tpu.training.step import (init_train_state,
                                                      make_train_step)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _batch(B=8, N=16, seed=0):
    rng = np.random.default_rng(seed)
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(N - 5, N + 1, B)), N)
    x = jnp.asarray(rng.standard_normal((B, N, 3)),
                    dtype=jnp.float32) * node_mask
    com = (x * node_mask).sum(1, keepdims=True) / node_mask.sum(
        1, keepdims=True)
    x = (x - com) * node_mask
    h = jnp.asarray(np.eye(8)[rng.integers(0, 8, (B, N))],
                    dtype=jnp.float32) * node_mask
    ctx = jnp.asarray(rng.standard_normal((B, N, 3)),
                      dtype=jnp.float32) * node_mask
    return x, h, node_mask, edge_mask, ctx


def test_edge_sharded_dynamics_matches_dense():
    cfg = EGNNConfig(hidden_nf=32, n_blocks=2)
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((2, 4))
    x, h, node_mask, edge_mask, ctx = _batch()
    xh = jnp.concatenate([x, h], axis=-1)
    t = jnp.full((x.shape[0],), 0.3)

    dense = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg)
    fn = jax.jit(jax.shard_map(
        partial(dynamics_forward_sharded, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"),
                  P("data", None, "edge"), P("data")),
        out_specs=P("data")))
    sharded = fn(params, t, xh, node_mask, edge_mask, ctx)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded),
                               rtol=1e-4, atol=1e-5)


def test_train_step_decreases_loss():
    cfg = EGNNConfig(hidden_nf=32, n_blocks=2)
    dcfg = DiffusionConfig(timesteps=20)
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((4, 2))
    x, h, node_mask, edge_mask, ctx = _batch()
    batch = dict(x=x, h=h, node_mask=node_mask, edge_mask=edge_mask,
                 context=ctx)
    gamma = jnp.asarray(gamma_schedule(20))
    step = make_train_step(mesh, cfg, dcfg)
    opt_state = init_train_state(params)

    fixed = jax.random.PRNGKey(99)

    def full_loss(p):
        l, _ = edm_training_loss(p, fixed, x, h, node_mask, edge_mask, ctx,
                                 gamma, cfg, dcfg)
        return float(l)

    l0 = full_loss(params)
    p, s = params, opt_state
    for i in range(20):
        p, s, metrics = step(p, s, jax.random.PRNGKey(100 + i), batch, gamma)
        assert np.isfinite(float(metrics["loss"]))
    assert full_loss(p) < l0


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (20, 42, 11)
    ge.dryrun_multichip(8)


def test_edm_input_device_matches_eager():
    """The fused single-program input prep (utils/masks._edm_input_device)
    must equal the op-by-op construction it replaced."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ml_conformer_generator_tpu.config import CONTEXT_NORMS
    from ml_conformer_generator_tpu.utils.masks import (normalize_context,
                                                        prepare_edm_input,
                                                        prepare_masks)

    key = jax.random.PRNGKey(5)
    nm, em, ctx, nn = prepare_edm_input(
        key, 6, jnp.asarray([105.0, 473.0, 537.0]), CONTEXT_NORMS, 16, 20,
        n_nodes_pad=24)
    # independent eager reconstruction from the same key
    n_nodes = jax.random.randint(key, (6,), 16, 21)
    np.testing.assert_array_equal(np.asarray(nn), np.asarray(n_nodes))
    nm2, em2 = prepare_masks(n_nodes, 24)
    np.testing.assert_array_equal(np.asarray(nm), np.asarray(nm2))
    np.testing.assert_array_equal(np.asarray(em), np.asarray(em2))
    normed = normalize_context(jnp.asarray([105.0, 473.0, 537.0]),
                               CONTEXT_NORMS)
    ctx2 = jnp.broadcast_to(normed.reshape(1, 1, 3), (6, 24, 3)) * nm2
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx2), rtol=1e-7)


def test_remat_flag_preserves_forward_and_gradients():
    """EGNNConfig.remat must be a pure memory/schedule choice: forward
    values are identical and gradients agree to float32 roundoff with the
    flag on and off (remat recomputes the forward inside the backward, so
    fusion/reassociation may differ by ulps; dense path — the sharded path
    shares the same jax.checkpoint wiring)."""
    import dataclasses

    from ml_conformer_generator_tpu.models.egnn import (egnn_forward,
                                                        init_egnn_params)
    from ml_conformer_generator_tpu.utils.masks import prepare_masks

    cfg = EGNNConfig(hidden_nf=16, n_blocks=3)
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    B, N = 2, 8
    rng = np.random.default_rng(0)
    node_mask, edge_mask = prepare_masks(jnp.asarray([6, 8]), N)
    h = jnp.asarray(rng.standard_normal((B, N, cfg.total_node_nf)),
                    dtype=jnp.float32) * node_mask
    x = jnp.asarray(rng.standard_normal((B, N, 3)),
                    dtype=jnp.float32) * node_mask

    def loss(p, c):
        ho, xo = egnn_forward(p, h, x, node_mask, edge_mask, c)
        return (ho ** 2).sum() + (xo ** 2).sum()

    v0, g0 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    assert float(v0) == float(v1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
