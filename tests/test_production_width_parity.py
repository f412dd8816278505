"""Parity and checkpoint round-trips at PRODUCTION shapes (hidden 420, 9
blocks; AdjMatSeer hidden 2048).

The per-layer parity suite runs at hidden 32 for speed
(``test_egnn_parity.py``); width-dependent conversion bugs in
``checkpoint.py`` (head/tail slicing, stacking) would escape it. These tests
close that gap: a float64 single-denoise-step parity at the exact production
configuration (reference ``egnn.py:448-465``: EGNNDynamics in_node_nf=9,
context 3, hidden 420) and exact round-trips of both converters at production
shapes, loaded strict into the real reference modules.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_conformer_generator_tpu.checkpoint import (
    adj_mat_seer_params_to_torch_names, egnn_params_to_torch_names,
    torch_names_to_adj_mat_seer_params, torch_names_to_egnn_params)
from ml_conformer_generator_tpu.config import (AdjMatSeerConfig,
                                               DiffusionConfig, EGNNConfig)
from ml_conformer_generator_tpu.diffusion.edm import (
    EDMSampler, sample_combined_position_feature_noise)
from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
from ml_conformer_generator_tpu.models.adj_mat_seer import (
    init_adj_mat_seer_params)
from ml_conformer_generator_tpu.models.egnn import init_egnn_params
from ml_conformer_generator_tpu.utils.masks import prepare_masks

from test_egnn_parity import make_torch_dynamics
from torch_ref_loader import load_diffusion

PROD_CFG = EGNNConfig()          # 420 x 9, in_node_nf=9, context 3
PROD_ADJ = AdjMatSeerConfig()    # 42 nodes, hidden 2048, embedding 64/36


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_production_width_single_step_parity(x64):
    """One reverse-diffusion step (phi + posterior + noise + CoM projection)
    at hidden 420 / 9 blocks in f64, vs the torch reference."""
    T = 100
    B, N = 2, 12
    params = init_egnn_params(jax.random.PRNGKey(0), PROD_CFG,
                              dtype=jnp.float64)
    sampler = EDMSampler(PROD_CFG, DiffusionConfig(timesteps=T))
    gamma = jnp.asarray(gamma_schedule(T), jnp.float64)
    node_mask, edge_mask = prepare_masks(jnp.asarray([10, 12]), N)
    node_mask = jnp.asarray(np.asarray(node_mask), jnp.float64)
    edge_mask = jnp.asarray(np.asarray(edge_mask), jnp.float64)
    rng = np.random.default_rng(1)
    context = jnp.asarray(
        rng.standard_normal((B, N, 3)) * np.asarray(node_mask), jnp.float64)
    z = jnp.asarray(rng.standard_normal((B, N, 11)) * np.asarray(node_mask),
                    jnp.float64)

    s = 42
    key = jax.random.PRNGKey(7)
    zs_jax = sampler.sample_p_zs_given_zt(
        params, key, z, jnp.asarray(s), gamma, node_mask, edge_mask, context)

    ref = load_diffusion()
    dyn = make_torch_dynamics(PROD_CFG, params, double=True)
    ed = ref.EquivariantDiffusion(dynamics=dyn, in_node_nf=8, n_dims=3,
                                  timesteps=T, noise_precision=1e-5).double()
    ed.gamma.gamma.data = torch.tensor(np.asarray(gamma),
                                       dtype=torch.float64)
    eps = sample_combined_position_feature_noise(key, B, N, node_mask, 3, 8)
    ed.sample_combined_position_feature_noise = (
        lambda *a: torch.tensor(np.asarray(eps), dtype=torch.float64))
    s_arr = torch.full((B, 1), float(s), dtype=torch.float64) / T
    t_arr = torch.full((B, 1), float(s + 1), dtype=torch.float64) / T
    with torch.no_grad():
        zs_t = ed.sample_p_zs_given_zt(
            s_arr, t_arr, torch.tensor(np.asarray(z)),
            torch.tensor(np.asarray(node_mask)),
            torch.tensor(np.asarray(edge_mask).reshape(B * N * N, 1)),
            torch.tensor(np.asarray(context)))
    np.testing.assert_allclose(np.asarray(zs_jax), zs_t.numpy(),
                               rtol=1e-9, atol=1e-11)


def _trees_equal(a, b, path=""):
    assert set(a) == set(b), f"key mismatch at {path}: {set(a)} vs {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"leaf {path}/{k}")


def test_egnn_checkpoint_roundtrip_production_shapes():
    params = init_egnn_params(jax.random.PRNGKey(3), PROD_CFG)
    state = egnn_params_to_torch_names(params, PROD_CFG)
    back = torch_names_to_egnn_params(state, PROD_CFG)
    _trees_equal(params, back)


def test_adj_mat_seer_checkpoint_roundtrip_production_shapes():
    params = init_adj_mat_seer_params(jax.random.PRNGKey(4), PROD_ADJ)
    state = adj_mat_seer_params_to_torch_names(params)
    back = torch_names_to_adj_mat_seer_params(state)
    _trees_equal(params, back)


def test_egnn_export_loads_strict_into_reference_at_production_width():
    """The exported name/shape table must match the real reference module
    exactly at 420x9 (strict load already asserted inside the helper)."""
    params = init_egnn_params(jax.random.PRNGKey(5), PROD_CFG,
                              dtype=jnp.float32)
    dyn = make_torch_dynamics(PROD_CFG, params, double=False)
    got = dict(dyn.egnn.state_dict())
    assert got["embedding.weight"].shape == (420, 12)
    assert got["e_block_8.gcl_1.edge_mlp.0.weight"].shape == (420, 842)
    assert got["e_block_0.gcl_equiv.coord_mlp.4.weight"].shape == (1, 420)


def test_adj_mat_seer_export_loads_strict_into_reference():
    from torch_ref_loader import load_adj_mat_seer

    ref = load_adj_mat_seer()
    params = init_adj_mat_seer_params(jax.random.PRNGKey(6), PROD_ADJ)
    model = ref.AdjMatSeer(dimension=42, n_hidden=2048, embedding_dim=64,
                           num_embeddings=36, device=torch.device("cpu"))
    state = {k: torch.tensor(np.asarray(v))
             for k, v in adj_mat_seer_params_to_torch_names(params).items()}
    missing, unexpected = model.load_state_dict(state, strict=True)
    assert not missing and not unexpected
