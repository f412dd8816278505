"""Direct tests of the noise schedule and EDM sampler invariants
(diffusion/schedule.py + diffusion/edm.py; reference:
equivariant_diffusion.py:9-45,108-134,224-363)."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
from ml_conformer_generator_tpu.diffusion.edm import (
    EDMSampler, align_fragment_com_to_generated, alpha_of,
    sample_combined_position_feature_noise, sigma_and_alpha_t_given_s,
    sigma_of)
from ml_conformer_generator_tpu.diffusion.schedule import (gamma_schedule,
                                                           polynomial_schedule)
from ml_conformer_generator_tpu.models.egnn import init_egnn_params
from ml_conformer_generator_tpu.utils.masks import prepare_masks

CFG = EGNNConfig(hidden_nf=32, n_blocks=2)
DIFF = DiffusionConfig(timesteps=8)


def _reference_schedule(T, s=1e-5, power=2):
    """Independent re-derivation of the reference's polynomial schedule
    (equivariant_diffusion.py:9-45)."""
    steps = T + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    a = np.concatenate([np.ones(1), alphas2])
    ratio = np.clip(a[1:] / a[:-1], 0.001, 1.0)
    alphas2 = np.cumprod(ratio)
    return (1 - 2 * s) * alphas2 + s


def test_polynomial_schedule_matches_reference_formula():
    for T in (10, 100, 1000):
        ours = polynomial_schedule(T, s=1e-5, power=2)
        ref = _reference_schedule(T)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
        # monotone decreasing from ~1 toward ~0
        assert ours[0] > 0.99 and ours[-1] < 0.01
        assert np.all(np.diff(ours) <= 0)


def test_gamma_variance_preserving_identities():
    gamma = jnp.asarray(gamma_schedule(100))
    assert gamma.shape == (101,)
    s2 = sigma_of(gamma) ** 2
    a2 = alpha_of(gamma) ** 2
    np.testing.assert_allclose(np.asarray(s2 + a2), 1.0, atol=1e-6)
    # consistency of the transition coefficients: alpha_{t|s} = alpha_t/alpha_s
    g_s, g_t = gamma[40], gamma[41]
    s2_tgs, s_tgs, a_tgs = sigma_and_alpha_t_given_s(g_t, g_s)
    np.testing.assert_allclose(float(a_tgs),
                               float(alpha_of(g_t) / alpha_of(g_s)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s2_tgs), float(s_tgs) ** 2, rtol=1e-5)


def test_position_noise_is_zero_com():
    node_mask, _ = prepare_masks(jnp.asarray([5, 9, 12]), 16)
    z = sample_combined_position_feature_noise(
        jax.random.PRNGKey(0), 3, 16, node_mask, 3, 8)
    x = np.asarray(z[..., :3])
    com = (x * np.asarray(node_mask)).sum(axis=1)
    np.testing.assert_allclose(com, 0.0, atol=1e-5)
    # masked rows carry no noise
    assert np.abs(np.asarray(z)[np.asarray(node_mask)[..., 0] == 0]).max() == 0


def test_generate_output_zero_com_and_masked():
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    sampler = EDMSampler(CFG, DIFF)
    gamma = jnp.asarray(gamma_schedule(DIFF.timesteps))
    node_mask, edge_mask = prepare_masks(jnp.asarray([10, 14]), 16)
    ctx = jnp.zeros((2, 16, 3))
    x, h = jax.jit(sampler.generate)(params, jax.random.PRNGKey(1), gamma,
                                     node_mask, edge_mask, ctx)
    xm = np.asarray(x) * np.asarray(node_mask)
    np.testing.assert_allclose(xm.sum(axis=1), 0.0, atol=2e-4)
    hm = np.asarray(h)
    # one-hot decode: rows of real atoms sum to 1, padded rows to 0
    sums = hm.sum(axis=-1)
    mask = np.asarray(node_mask)[..., 0]
    np.testing.assert_allclose(sums[mask == 1], 1.0)
    np.testing.assert_allclose(sums[mask == 0], 0.0)


class _ZeroEpsSampler(EDMSampler):
    """Sampler with a perfect eps=0 denoiser: latents stay bounded, so the
    inpainting *machinery* (blend schedule, CoM alignment, harmonisation,
    decode) can be asserted deterministically. With untrained random weights
    the latents diverge (~1e4) and mask any geometric assertion — the known
    behaviour of eps-diffusion without a trained denoiser."""

    def phi(self, params, z, t, node_mask, edge_mask, context):
        return jnp.zeros_like(z)


def test_inpaint_preserves_fragment_geometry():
    """At s=0 the blend weight is 1, so the fixed fragment's internal
    geometry survives inpainting up to the CoM alignment translation plus the
    final harmonisation denoise at s=0 (reference
    equivariant_diffusion.py:79-105,489-510 applies the same extra pass)."""
    params = init_egnn_params(jax.random.PRNGKey(0), CFG)
    sampler = _ZeroEpsSampler(CFG, DIFF)
    gamma = jnp.asarray(gamma_schedule(DIFF.timesteps))
    B, N, n_frag = 2, 12, 5
    node_mask, edge_mask = prepare_masks(jnp.asarray([10, 12]), N)
    ctx = jnp.zeros((B, N, 3))
    rng = np.random.default_rng(3)
    frag = jnp.asarray(rng.standard_normal((n_frag, 3)), jnp.float32)
    # classes 0..6 only: the decode drops the last class channel before the
    # argmax (reference parity — see diffusion/edm.py module docstring)
    frag_h = jnp.asarray(np.eye(8)[rng.integers(0, 7, n_frag)], jnp.float32)
    z_known = jnp.zeros((B, N, 11))
    z_known = z_known.at[:, :n_frag, :3].set(frag)
    z_known = z_known.at[:, :n_frag, 3:].set(frag_h / DIFF.norm_values[1])
    fixed_mask = (jnp.arange(N) < n_frag).astype(jnp.float32)
    fixed_mask = jnp.broadcast_to(fixed_mask[None, :, None], (B, N, 1))

    x, h = jax.jit(lambda *a: sampler.inpaint(*a))(
        params, jax.random.PRNGKey(5), gamma, node_mask, edge_mask, ctx,
        z_known, fixed_mask)
    # internal pairwise distances of the fragment are translation-invariant
    got = np.asarray(x)[:, :n_frag]
    want = np.asarray(frag)
    dg = np.linalg.norm(got[:, :, None] - got[:, None, :], axis=-1)
    dw = np.linalg.norm(want[:, None] - want[None, :], axis=-1)
    np.testing.assert_allclose(dg, np.broadcast_to(dw, dg.shape), atol=0.1)
    # fragment atom types survive (argmax decode is robust to the final pass)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(h)[:, :n_frag], axis=-1),
        np.broadcast_to(np.argmax(np.asarray(frag_h), axis=-1), (B, n_frag)))


def test_schedule_rebuild_lengths():
    for T in (20, 50, 100):
        assert gamma_schedule(T).shape == (T + 1,)
