"""Edge+data-sharded full-sampler tests on the 8-device virtual mesh
(parallel/sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
from ml_conformer_generator_tpu.diffusion.edm import EDMSampler
from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
from ml_conformer_generator_tpu.models.egnn import init_egnn_params
from ml_conformer_generator_tpu.parallel.mesh import make_mesh
from ml_conformer_generator_tpu.parallel.sampler import make_sharded_generate
from ml_conformer_generator_tpu.utils.masks import prepare_masks

CFG = EGNNConfig(hidden_nf=24, n_blocks=2)
DIFF = DiffusionConfig(timesteps=5)


def _inputs(B=4, N=16):
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(np.random.default_rng(0).integers(10, N, size=B)), N)
    ctx = jnp.zeros((B, N, 3))
    return node_mask, edge_mask, ctx


def test_sharded_generate_matches_dense():
    """(1 data x 8 edge) mesh: identical RNG stream -> outputs match the
    dense single-device sampler up to float reordering of the psum'd j-sum."""
    mesh = make_mesh((1, 8))
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    gamma = jnp.asarray(gamma_schedule(DIFF.timesteps))
    node_mask, edge_mask, ctx = _inputs()
    key = jax.random.PRNGKey(3)

    fn = make_sharded_generate(mesh, CFG, DIFF)
    xs, hs = fn(params, key, gamma, node_mask, edge_mask, ctx)

    dense = EDMSampler(CFG, DIFF)
    # the sharded path folds the data-axis index (0) into the key
    xd, hd = jax.jit(dense.generate)(params, jax.random.fold_in(key, 0),
                                     gamma, node_mask, edge_mask, ctx)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xd), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(hs), np.asarray(hd))


def test_sharded_generate_data_axis_independent_streams():
    """(4 data x 2 edge): different data shards draw different noise."""
    mesh = make_mesh((4, 2))
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    gamma = jnp.asarray(gamma_schedule(DIFF.timesteps))
    node_mask, edge_mask, ctx = _inputs(B=4, N=16)
    # same per-sample size everywhere so shards are comparable
    node_mask = jnp.ones_like(node_mask)
    edge_mask = jnp.ones_like(edge_mask) * (
        1 - jnp.eye(16)[None, :, :, None])

    fn = make_sharded_generate(mesh, CFG, DIFF)
    x, h = fn(params, jax.random.PRNGKey(7), gamma, node_mask, edge_mask,
              ctx)
    x = np.asarray(x)
    assert np.isfinite(x).all()
    # batch rows live on different data shards -> distinct samples
    assert np.abs(x[0] - x[1]).max() > 1e-3
