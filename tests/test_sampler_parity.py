"""Float64 trajectory parity of the EDM sampler vs the PyTorch reference.

Strategy: both stacks share the same weights (via the checkpoint name mapping)
and the same gamma lookup table; all stochasticity is pinned by *replaying* the
JAX sampler's key-split schedule on the host, materialising every noise draw in
call order, and injecting that queue into the torch reference
(``/root/reference/src/mlconfgen/equivariant_diffusion.py`` — ``forward``
:365-421, ``inpaint`` :423-513, ``merge_fragments`` :515-607). With identical
weights, gamma and noise, the two trajectories must agree to float64 rounding;
a ±1 gamma-index slip, a wrong blend exponent, or a dropped CoM projection
produces O(1) divergence (asserted by the mutation-sensitivity test below).

The replay in ``_replay_noise`` doubles as the documented RNG contract of
``diffusion/edm.py``: if the key-split structure there changes, this file must
change with it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
from ml_conformer_generator_tpu.diffusion.edm import (
    EDMSampler, sample_combined_position_feature_noise)
from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
from ml_conformer_generator_tpu.models.egnn import init_egnn_params
from ml_conformer_generator_tpu.utils.masks import prepare_masks

from test_egnn_parity import make_torch_dynamics
from torch_ref_loader import load_diffusion

CFG = EGNNConfig(hidden_nf=32, n_blocks=9)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Shared fixtures: weights, masks, torch sampler with injected noise
# ---------------------------------------------------------------------------


def _setup(T, B=2, N=12, seed=0):
    diff = DiffusionConfig(timesteps=T)
    params = init_egnn_params(jax.random.PRNGKey(seed), CFG,
                              dtype=jnp.float64)
    sampler = EDMSampler(CFG, diff)
    gamma = jnp.asarray(gamma_schedule(T), jnp.float64)
    rng = np.random.default_rng(seed)
    n_nodes = rng.integers(N - 4, N + 1, size=B)
    node_mask, edge_mask = prepare_masks(jnp.asarray(n_nodes), N)
    node_mask = jnp.asarray(np.asarray(node_mask), jnp.float64)
    edge_mask = jnp.asarray(np.asarray(edge_mask), jnp.float64)
    context = jnp.asarray(
        rng.standard_normal((B, N, 3)) * np.asarray(node_mask), jnp.float64)
    return sampler, params, gamma, node_mask, edge_mask, context


def _make_torch_ed(params, gamma, T):
    """Reference EquivariantDiffusion in f64 with our weights + gamma table."""
    ref = load_diffusion()
    dyn = make_torch_dynamics(CFG, params, double=True)
    ed = ref.EquivariantDiffusion(dynamics=dyn, in_node_nf=8, n_dims=3,
                                  timesteps=T, noise_precision=1e-5)
    ed = ed.double()
    ed.gamma.gamma.data = torch.tensor(np.asarray(gamma),
                                       dtype=torch.float64)
    return ed


def _inject_noise(ed, noises):
    """Make the torch sampler consume a pre-recorded noise queue in order."""
    queue = [torch.tensor(np.asarray(n), dtype=torch.float64) for n in noises]

    def pop(n_samples, n_nodes, node_mask):
        return queue.pop(0)

    ed.sample_combined_position_feature_noise = pop
    return queue


def _replay_noise(kind, key, T, B, N, node_mask, resample_steps=0,
                  diffusion_level=None):
    """Replay diffusion/edm.py's key-split schedule, materialising each draw.

    Mirrors the control flow of EDMSampler.generate / .inpaint /
    .merge_fragments exactly (init noise, per-step draws in resample order,
    decode noise)."""
    draws = []

    def draw(k):
        draws.append(sample_combined_position_feature_noise(
            k, B, N, node_mask, 3, 8))

    if kind == "generate":
        key, init_key = jax.random.split(key)
        draw(init_key)
        for _ in range(T):
            for _ in range(resample_steps + 1):
                key, sub = jax.random.split(key)
                draw(sub)
    elif kind == "inpaint":
        r = max(resample_steps, 1)
        key, init_key = jax.random.split(key)
        draw(init_key)
        for _ in range(T):
            for _ in range(r):
                key, k1, k2 = jax.random.split(key, 3)
                draw(k1)
                draw(k2)
            key, k3 = jax.random.split(key)
            draw(k3)
    elif kind == "merge":
        r = max(resample_steps, 1)
        key, noise_key = jax.random.split(key)
        draw(noise_key)
        for _ in range(min(diffusion_level, T - 1) + 1):
            for _ in range(r):
                key, k1, k2 = jax.random.split(key, 3)
                draw(k1)
                draw(k2)
    else:  # pragma: no cover
        raise ValueError(kind)
    key, dec_key = jax.random.split(key)
    draw(dec_key)
    return draws


def _fragment_inputs(B, N, n_frag=4, seed=3):
    rng = np.random.default_rng(seed)
    z_known = np.zeros((B, N, 11))
    z_known[:, :n_frag, :3] = rng.standard_normal((n_frag, 3))
    z_known[:, :n_frag, 3:] = np.eye(8)[rng.integers(0, 7, n_frag)] / 9.0
    fixed = (np.arange(N) < n_frag).astype(np.float64)[None, :, None]
    return (jnp.asarray(z_known, jnp.float64),
            jnp.asarray(np.broadcast_to(fixed, (B, N, 1)), jnp.float64))


def _torch_args(node_mask, edge_mask, context):
    B, N, _ = node_mask.shape
    return (torch.tensor(np.asarray(node_mask), dtype=torch.float64),
            torch.tensor(np.asarray(edge_mask).reshape(B * N * N, 1),
                         dtype=torch.float64),
            torch.tensor(np.asarray(context), dtype=torch.float64))


def _assert_xh_close(ours, theirs, rtol, atol):
    x_j, h_j = (np.asarray(a) for a in ours)
    x_t, h_t = (a.numpy() if hasattr(a, "numpy") else np.asarray(a)
                for a in theirs)
    np.testing.assert_allclose(x_j, x_t, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(h_j, h_t)


# ---------------------------------------------------------------------------
# Single-step parity (reference :295-339 and :261-285)
# ---------------------------------------------------------------------------


def test_sample_p_zs_given_zt_parity(x64):
    T = 100
    sampler, params, gamma, node_mask, edge_mask, context = _setup(T)
    B, N, _ = node_mask.shape
    ed = _make_torch_ed(params, gamma, T)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((B, N, 11)) * np.asarray(node_mask),
                    jnp.float64)
    nm_t, em_t, ctx_t = _torch_args(node_mask, edge_mask, context)
    for s in (0, 1, 42, 73, T - 1):
        key = jax.random.PRNGKey(100 + s)
        eps = sample_combined_position_feature_noise(
            key, B, N, node_mask, 3, 8)
        _inject_noise(ed, [eps])
        zs_jax = sampler.sample_p_zs_given_zt(
            params, key, z, jnp.asarray(s), gamma, node_mask, edge_mask,
            context)
        s_arr = torch.full((B, 1), float(s), dtype=torch.float64) / T
        t_arr = torch.full((B, 1), float(s + 1), dtype=torch.float64) / T
        with torch.no_grad():
            zs_t = ed.sample_p_zs_given_zt(
                s_arr, t_arr, torch.tensor(np.asarray(z)), nm_t, em_t, ctx_t)
        np.testing.assert_allclose(np.asarray(zs_jax), zs_t.numpy(),
                                   rtol=1e-9, atol=1e-12)


def test_decode_z0_parity(x64):
    T = 100
    sampler, params, gamma, node_mask, edge_mask, context = _setup(T, seed=2)
    B, N, _ = node_mask.shape
    ed = _make_torch_ed(params, gamma, T)
    rng = np.random.default_rng(4)
    z0 = jnp.asarray(rng.standard_normal((B, N, 11)) * np.asarray(node_mask),
                     jnp.float64)
    key = jax.random.PRNGKey(7)
    eps = sample_combined_position_feature_noise(key, B, N, node_mask, 3, 8)
    _inject_noise(ed, [eps])
    x_j, h_j = sampler.decode_z0(params, key, z0, gamma, node_mask, edge_mask,
                                 context)
    nm_t, em_t, ctx_t = _torch_args(node_mask, edge_mask, context)
    with torch.no_grad():
        x_t, h_t = ed.sample_p_xh_given_z0(
            torch.tensor(np.asarray(z0)), nm_t, em_t, ctx_t)
    _assert_xh_close((x_j, h_j), (x_t, h_t), rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# Full-trajectory parity
# ---------------------------------------------------------------------------


def _run_generate(T, resample_steps, rtol, atol, seed=0):
    sampler, params, gamma, node_mask, edge_mask, context = _setup(T,
                                                                   seed=seed)
    B, N, _ = node_mask.shape
    key = jax.random.PRNGKey(11)
    x_j, h_j = sampler.generate(params, key, gamma, node_mask, edge_mask,
                                context, resample_steps=resample_steps)
    ed = _make_torch_ed(params, gamma, T)
    queue = _inject_noise(
        ed, _replay_noise("generate", key, T, B, N, node_mask,
                          resample_steps=resample_steps))
    with torch.no_grad():
        x_t, h_t = ed.forward(*_torch_args(node_mask, edge_mask, context),
                              resample_steps=resample_steps)
    assert not queue, "torch consumed fewer noise draws than the replay"
    _assert_xh_close((x_j, h_j), (x_t, h_t), rtol=rtol, atol=atol)


def test_generate_trajectory_parity_T8(x64):
    _run_generate(T=8, resample_steps=0, rtol=1e-9, atol=1e-11)


def test_generate_trajectory_parity_T8_resample(x64):
    _run_generate(T=8, resample_steps=2, rtol=1e-9, atol=1e-11)


def test_generate_trajectory_parity_T100(x64):
    # Untrained weights make the latent trajectory mildly chaotic; float64
    # reordering drift amplifies over 100 recurrent steps, hence the looser
    # (still mutation-sensitive: a gamma slip gives O(1) divergence) bound.
    _run_generate(T=100, resample_steps=0, rtol=1e-4, atol=1e-6)


def test_inpaint_trajectory_parity(x64):
    for T, resample, rtol, atol in ((8, 1, 1e-9, 1e-11), (8, 2, 1e-9, 1e-11),
                                    (100, 1, 1e-4, 1e-6)):
        sampler, params, gamma, node_mask, edge_mask, context = _setup(T)
        B, N, _ = node_mask.shape
        z_known, fixed_mask = _fragment_inputs(B, N)
        key = jax.random.PRNGKey(13)
        x_j, h_j = sampler.inpaint(params, key, gamma, node_mask, edge_mask,
                                   context, z_known, fixed_mask,
                                   resample_steps=resample, blend_power=3)
        ed = _make_torch_ed(params, gamma, T)
        queue = _inject_noise(
            ed, _replay_noise("inpaint", key, T, B, N, node_mask,
                              resample_steps=resample))
        nm_t, em_t, ctx_t = _torch_args(node_mask, edge_mask, context)
        with torch.no_grad():
            x_t, h_t = ed.inpaint(
                nm_t, em_t, ctx_t,
                torch.tensor(np.asarray(z_known), dtype=torch.float64),
                torch.tensor(np.asarray(fixed_mask), dtype=torch.float64),
                resample_steps=resample, blend_power=3)
        assert not queue
        _assert_xh_close((x_j, h_j), (x_t, h_t), rtol=rtol, atol=atol)


def test_merge_trajectory_parity(x64):
    # (8, 20, ...) exercises the level > T clamp: our gamma gather clamps to
    # gamma[T], matching the reference called at its maximum legal level.
    for T, level, resample, rtol, atol in ((8, 4, 1, 1e-9, 1e-11),
                                           (8, 20, 1, 1e-9, 1e-11),
                                           (100, 50, 1, 1e-4, 1e-6)):
        sampler, params, gamma, node_mask, edge_mask, context = _setup(T)
        B, N, _ = node_mask.shape
        z_known, fixed_mask = _fragment_inputs(B, N, n_frag=6, seed=9)
        key = jax.random.PRNGKey(17)
        x_j, h_j = sampler.merge_fragments(
            params, key, gamma, node_mask, edge_mask, fixed_mask, context,
            z_known, diffusion_level=level, resample_steps=resample,
            blend_power=3)
        ed = _make_torch_ed(params, gamma, T)
        queue = _inject_noise(
            ed, _replay_noise("merge", key, T, B, N, node_mask,
                              resample_steps=resample, diffusion_level=level))
        nm_t, em_t, ctx_t = _torch_args(node_mask, edge_mask, context)
        with torch.no_grad():
            x_t, h_t = ed.merge_fragments(
                nm_t, em_t,
                torch.tensor(np.asarray(fixed_mask), dtype=torch.float64),
                ctx_t,
                torch.tensor(np.asarray(z_known), dtype=torch.float64),
                diffusion_level=min(level, T),
                resample_steps=resample, blend_power=3)
        assert not queue
        _assert_xh_close((x_j, h_j), (x_t, h_t), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# Mutation sensitivity: the harness must catch the bug classes it targets
# ---------------------------------------------------------------------------


class _GammaShiftSampler(EDMSampler):
    """Deliberately buggy sampler: ±1 gamma-index slip in the reverse step."""

    def step_mu_sigma(self, params, z, s_idx, gamma, node_mask, edge_mask,
                      context):
        return super().step_mu_sigma(params, z, s_idx + 1, gamma,
                                     node_mask, edge_mask, context)


def test_harness_catches_gamma_index_slip(x64):
    T = 8
    sampler, params, gamma, node_mask, edge_mask, context = _setup(T)
    B, N, _ = node_mask.shape
    bad = _GammaShiftSampler(CFG, DiffusionConfig(timesteps=T))
    key = jax.random.PRNGKey(11)
    x_bad, _ = bad.generate(params, key, gamma, node_mask, edge_mask,
                            context)
    ed = _make_torch_ed(params, gamma, T)
    _inject_noise(ed, _replay_noise("generate", key, T, B, N, node_mask))
    with torch.no_grad():
        x_t, _ = ed.forward(*_torch_args(node_mask, edge_mask, context))
    # the slip must blow far past the trajectory tolerance
    assert np.max(np.abs(np.asarray(x_bad) - x_t.numpy())) > 1e-2


def test_harness_catches_blend_power_mutation(x64):
    T = 8
    sampler, params, gamma, node_mask, edge_mask, context = _setup(T)
    B, N, _ = node_mask.shape
    z_known, fixed_mask = _fragment_inputs(B, N)
    key = jax.random.PRNGKey(13)
    x_bad, _ = sampler.inpaint(params, key, gamma, node_mask, edge_mask,
                               context, z_known, fixed_mask,
                               resample_steps=1, blend_power=2)
    ed = _make_torch_ed(params, gamma, T)
    _inject_noise(ed, _replay_noise("inpaint", key, T, B, N, node_mask,
                                    resample_steps=1))
    nm_t, em_t, ctx_t = _torch_args(node_mask, edge_mask, context)
    with torch.no_grad():
        x_t, _ = ed.inpaint(
            nm_t, em_t, ctx_t,
            torch.tensor(np.asarray(z_known), dtype=torch.float64),
            torch.tensor(np.asarray(fixed_mask), dtype=torch.float64),
            resample_steps=1, blend_power=3)
    assert np.max(np.abs(np.asarray(x_bad) - x_t.numpy())) > 1e-4
