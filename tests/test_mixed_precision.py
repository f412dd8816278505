"""bfloat16 compute path: numerically close to f32, geometry stays f32."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                    init_egnn_params)
from ml_conformer_generator_tpu.utils.masks import prepare_masks


def _inputs(rng, B=4, N=20):
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(15, 20, B)), N)
    xh = jnp.asarray(rng.standard_normal((B, N, 11)),
                     dtype=jnp.float32) * node_mask
    ctx = jnp.asarray(rng.standard_normal((B, N, 3)),
                      dtype=jnp.float32) * node_mask
    t = jnp.full((B,), 0.5)
    return t, xh, node_mask, edge_mask, ctx


def test_bf16_close_to_f32(rng):
    cfg32 = EGNNConfig(hidden_nf=64, n_blocks=3)
    cfg16 = EGNNConfig(hidden_nf=64, n_blocks=3, compute_dtype="bfloat16")
    params = init_egnn_params(jax.random.PRNGKey(0), cfg32)
    t, xh, node_mask, edge_mask, ctx = _inputs(rng)

    o32 = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg32)
    o16 = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg16)

    assert o16.dtype == jnp.float32  # outputs always full precision
    scale = np.abs(np.asarray(o32)).max()
    rel = np.abs(np.asarray(o32) - np.asarray(o16)).max() / scale
    assert rel < 0.05, f"bf16 deviates {rel:.3f} from f32"


def test_bf16_equivariance(rng):
    """Rotation equivariance must survive the mixed-precision path."""
    cfg = EGNNConfig(hidden_nf=32, n_blocks=2, compute_dtype="bfloat16")
    params = init_egnn_params(jax.random.PRNGKey(1), cfg)
    t, xh, node_mask, edge_mask, ctx = _inputs(rng)

    a = rng.standard_normal((3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    q = jnp.asarray(q, dtype=jnp.float32)

    out = dynamics_forward(params, t, xh, node_mask, edge_mask, ctx, cfg)
    xh_rot = jnp.concatenate([xh[..., :3] @ q, xh[..., 3:]], axis=-1)
    out_rot = dynamics_forward(params, t, xh_rot, node_mask, edge_mask, ctx,
                               cfg)
    # bf16 messages but f32 geometry: equivariance holds to bf16 noise level
    np.testing.assert_allclose(np.asarray(out[..., :3] @ q),
                               np.asarray(out_rot[..., :3]),
                               rtol=0, atol=2e-2)
