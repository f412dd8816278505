"""AOT StableHLO export tests (export.py; reference analog:
``onnx_export/onnx_export.py:10-43``)."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_conformer_generator_tpu.config import (AdjMatSeerConfig,
                                               DiffusionConfig, EGNNConfig)
from ml_conformer_generator_tpu.export import (export_adj_mat_seer,
                                               export_denoiser,
                                               export_sampler, load_exported,
                                               save_exported)
from ml_conformer_generator_tpu.models.adj_mat_seer import (
    adj_mat_seer_forward, init_adj_mat_seer_params)
from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                    init_egnn_params)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

CFG = EGNNConfig(hidden_nf=32, n_blocks=2, use_pallas="off")


def _denoiser_inputs(rng, B=2, N=12):
    node_mask, edge_mask = prepare_masks(jnp.asarray([8, 11]), N)
    nf = CFG.n_dims + CFG.in_node_nf - 1
    xh = jnp.asarray(rng.standard_normal((B, N, nf)), jnp.float32) * node_mask
    ctx = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32) * node_mask
    t = jnp.full((B,), 0.5, jnp.float32)
    return t, xh, node_mask, edge_mask, ctx


def test_denoiser_export_roundtrip(tmp_path, rng):
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    exp = export_denoiser(params, CFG, batch=2, n_nodes=12)
    path = str(tmp_path / "denoiser.stablehlo")
    save_exported(exp, path)
    loaded = load_exported(path)

    args = _denoiser_inputs(rng)
    direct = dynamics_forward(params, *args, CFG)
    via_export = loaded.call(params, *args)
    np.testing.assert_allclose(np.asarray(via_export), np.asarray(direct),
                               atol=1e-6)


def test_sampler_export_runs(tmp_path):
    diff = DiffusionConfig(timesteps=4)
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    exp = export_sampler(params, CFG, diff, batch=2, n_nodes=12)
    path = str(tmp_path / "s.stablehlo")
    save_exported(exp, path)
    loaded = load_exported(path)

    node_mask, edge_mask = prepare_masks(jnp.asarray([8, 11]), 12)
    ctx = jnp.zeros((2, 12, 3), jnp.float32)
    key = jax.random.key_data(jax.random.PRNGKey(7)).astype(jnp.uint32)
    x, h = loaded.call(params, key, node_mask, edge_mask, ctx)
    assert x.shape == (2, 12, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_adj_mat_seer_export_roundtrip(tmp_path, rng):
    cfg = AdjMatSeerConfig(dimension=12, n_hidden=64)
    params = init_adj_mat_seer_params(jax.random.PRNGKey(1), cfg)
    exp = export_adj_mat_seer(params, cfg, batch=2)
    path = str(tmp_path / "adj.stablehlo")
    save_exported(exp, path)
    loaded = load_exported(path)

    elements = jnp.asarray(rng.integers(0, 30, size=(2, 12)), jnp.int32)
    dist = jnp.abs(jnp.asarray(rng.standard_normal((2, 12, 12)), jnp.float32))
    adj = (dist < 1.0).astype(jnp.float32)
    direct = adj_mat_seer_forward(params, elements, dist, adj, cfg)
    via = loaded.call(params, elements, dist, adj)
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct), atol=1e-6)
