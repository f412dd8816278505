"""Activation parity of the JAX AdjMatSeer vs the PyTorch reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_conformer_generator_tpu.checkpoint import (
    adj_mat_seer_params_to_torch_names, torch_names_to_adj_mat_seer_params)
from ml_conformer_generator_tpu.config import AdjMatSeerConfig
from ml_conformer_generator_tpu.models.adj_mat_seer import (
    adj_mat_seer_forward, init_adj_mat_seer_params, l_norm)

from torch_ref_loader import load_adj_mat_seer


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _mk_inputs(cfg, B=4, seed=0):
    rng = np.random.default_rng(seed)
    elements = np.zeros((B, cfg.dimension), dtype=np.int64)
    dist = np.zeros((B, cfg.dimension, cfg.dimension), dtype=np.float64)
    adj = np.zeros_like(dist)
    for b in range(B):
        n = rng.integers(10, 30)
        elements[b, :n] = rng.choice([6, 7, 8, 9, 16, 17], size=n)
        coords = rng.standard_normal((n, 3)) * 2.0
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        dist[b, :n, :n] = d
        dist[b] += np.eye(cfg.dimension)
        a = (d < 1.8).astype(np.float64)
        adj[b, :n, :n] = a
        adj[b] += np.eye(cfg.dimension)
        adj[b][adj[b] > 0] = 1.0
    return elements, dist, adj


def test_adj_mat_seer_parity_f64(x64):
    cfg = AdjMatSeerConfig(n_hidden=128)  # small hidden for test speed
    params = init_adj_mat_seer_params(jax.random.PRNGKey(0), cfg,
                                      dtype=jnp.float64)
    ref = load_adj_mat_seer()
    model = ref.AdjMatSeer(dimension=cfg.dimension, n_hidden=cfg.n_hidden,
                           embedding_dim=cfg.embedding_dim,
                           num_embeddings=cfg.num_embeddings,
                           num_bond_types=cfg.num_bond_types,
                           device=torch.device("cpu")).double()
    state = {k: torch.tensor(np.asarray(v)) for k, v in
             adj_mat_seer_params_to_torch_names(params).items()}
    missing, unexpected = model.load_state_dict(state, strict=True)
    assert not missing and not unexpected

    elements, dist, adj = _mk_inputs(cfg)
    out_jax = adj_mat_seer_forward(params, jnp.asarray(elements),
                                   jnp.asarray(dist), jnp.asarray(adj), cfg)
    with torch.no_grad():
        out_t = model(torch.tensor(elements), torch.tensor(dist),
                      torch.tensor(adj))
    np.testing.assert_allclose(np.asarray(out_jax), out_t.numpy(),
                               rtol=1e-9, atol=1e-10)


def test_roundtrip_param_conversion():
    cfg = AdjMatSeerConfig(n_hidden=64)
    params = init_adj_mat_seer_params(jax.random.PRNGKey(1), cfg)
    state = adj_mat_seer_params_to_torch_names(params)
    back = torch_names_to_adj_mat_seer_params(state)
    for k in params:
        if isinstance(params[k], dict):
            for leaf in params[k]:
                np.testing.assert_array_equal(np.asarray(params[k][leaf]),
                                              back[k][leaf])
        else:
            np.testing.assert_array_equal(np.asarray(params[k]), back[k])


def test_l_norm_matches_reference(x64):
    ref = load_adj_mat_seer()
    gc = ref.GraphConv(8, 8, device=torch.device("cpu"))
    rng = np.random.default_rng(2)
    adj = rng.uniform(0, 2, (3, 10, 10))
    adj = adj + adj.transpose(0, 2, 1)
    ours = l_norm(jnp.asarray(adj))
    theirs = gc.l_norm(torch.tensor(adj))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-12, atol=1e-12)
