"""E(3)-equivariant diffusion (EDM) reverse sampler, compiled as one program.

Behavioural reference: ``/root/reference/src/mlconfgen/equivariant_diffusion.py``
(``EquivariantDiffusion`` :137-607). The reference dispatches each of the T
denoising steps from Python (T round-trips to the device); here the entire
reverse trajectory — including the resampling loops and the fragment blending
of ``inpaint``/``merge_fragments`` — is a single ``lax.scan`` under ``jit``,
so XLA schedules the whole trajectory as one TPU program.

Conventions:
* latent z: (B, N, 3 + in_node_nf) = [positions | atom features];
* node_mask: (B, N, 1) float; edge_mask: (B, N, N, 1) float;
* gamma: (T+1,) float32 lookup table from ``schedule.gamma_schedule``;
* all randomness flows through explicit jax.random keys.

Parity note: the reference's decode step (``sample_p_xh_given_z0`` :261-285)
takes atom-type features from ``z0[:, :, n_dims:-1]`` — dropping the *last*
atom-class channel before the argmax, so class 7 (Br) is never emitted. We
replicate this behaviour exactly for parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import DiffusionConfig, EGNNConfig
from ..models.egnn import dynamics_forward, remove_mean_with_mask


# ---------------------------------------------------------------------------
# Noise sampling
# ---------------------------------------------------------------------------


def sample_center_gravity_zero_gaussian_with_mask(key, shape, node_mask):
    """Masked gaussian positions projected to zero centre of mass (:56-67)."""
    x = jax.random.normal(key, shape) * node_mask
    return remove_mean_with_mask(x, node_mask)


def sample_gaussian_with_mask(key, shape, node_mask):
    return jax.random.normal(key, shape) * node_mask


def sample_combined_position_feature_noise(key, n_samples: int, n_nodes: int,
                                           node_mask, n_dims: int,
                                           in_node_nf: int):
    """Zero-CoM gaussian for positions, plain gaussian for features (:341-363)."""
    kx, kh = jax.random.split(key)
    z_x = sample_center_gravity_zero_gaussian_with_mask(
        kx, (n_samples, n_nodes, n_dims), node_mask)
    z_h = sample_gaussian_with_mask(
        kh, (n_samples, n_nodes, in_node_nf), node_mask)
    return jnp.concatenate([z_x, z_h], axis=-1)


# ---------------------------------------------------------------------------
# Closed-form schedule quantities
# ---------------------------------------------------------------------------


def sigma_of(gamma):
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def alpha_of(gamma):
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def sigma_and_alpha_t_given_s(gamma_t, gamma_s):
    """Posterior transition scales (reference :224-247). Scalars in, scalars out."""
    sigma2_t_given_s = 1 - jnp.exp(jax.nn.softplus(gamma_s)
                                   - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


def align_fragment_com_to_generated(z_known_noised, z_generated, fixed_mask):
    """Shift the fixed fragment so its CoM matches the generated one (:79-105)."""
    coords_known = z_known_noised[..., :3]
    coords_gen = z_generated[..., :3]
    denom = jnp.sum(fixed_mask, axis=1, keepdims=True)
    com_gen = jnp.sum(coords_gen * fixed_mask, axis=1, keepdims=True) / denom
    com_known = jnp.sum(coords_known * fixed_mask, axis=1, keepdims=True) / denom
    shift = com_gen - com_known
    coords_shifted = coords_known + shift * fixed_mask
    return jnp.concatenate([coords_shifted, z_known_noised[..., 3:]], axis=-1)


# ---------------------------------------------------------------------------
# Sampler
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EDMSampler:
    """Functional EDM reverse sampler bound to a dynamics network.

    ``gamma`` is passed at call time as a (T+1,) array so the same compiled
    program serves any step count of the same length.
    """

    egnn_cfg: EGNNConfig
    diff_cfg: DiffusionConfig

    # -- single-step math (exposed for parity tests, take explicit noise) ----

    def phi(self, params, z, t, node_mask, edge_mask, context):
        return dynamics_forward(params, t, z, node_mask, edge_mask, context,
                                self.egnn_cfg)

    def step_mu_sigma(self, params, z, s_idx, gamma, node_mask, edge_mask,
                      context):
        """mu and sigma of p(z_s | z_t) for integer step s (t = s+1) (:295-329)."""
        T = self.diff_cfg.timesteps
        gamma_s = gamma[s_idx]
        gamma_t = gamma[s_idx + 1]
        sigma2_tgs, sigma_tgs, alpha_tgs = sigma_and_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s = sigma_of(gamma_s)
        sigma_t = sigma_of(gamma_t)
        # Anchor to gamma's dtype so float64 parity runs stay float64 end to
        # end (float32 in production, where gamma is float32).
        t_norm = (s_idx + 1).astype(gamma.dtype) / T
        B = z.shape[0]
        t_arr = jnp.full((B,), t_norm)
        eps_t = self.phi(params, z, t_arr, node_mask, edge_mask, context)
        mu = z / alpha_tgs - (sigma2_tgs / alpha_tgs / sigma_t) * eps_t
        sigma = sigma_tgs * sigma_s / sigma_t
        return mu, sigma

    def sample_p_zs_given_zt(self, params, key, z, s_idx, gamma, node_mask,
                             edge_mask, context):
        """One reverse step z_t -> z_s with fresh noise; CoM-projected (:295-339)."""
        mu, sigma = self.step_mu_sigma(params, z, s_idx, gamma, node_mask,
                                       edge_mask, context)
        B, N, _ = z.shape
        eps = sample_combined_position_feature_noise(
            key, B, N, node_mask, self.diff_cfg.n_dims, self.diff_cfg.in_node_nf)
        zs = mu + sigma * eps
        x = remove_mean_with_mask(zs[..., : self.diff_cfg.n_dims], node_mask)
        return jnp.concatenate([x, zs[..., self.diff_cfg.n_dims:]], axis=-1)

    def decode_z0(self, params, key, z0, gamma, node_mask, edge_mask, context):
        """Sample p(x, h | z0): final denoise + argmax one-hot decode (:261-285)."""
        nd = self.diff_cfg.n_dims
        gamma_0 = gamma[0]
        sigma_x = jnp.exp(0.5 * gamma_0)  # snr(-0.5 * gamma_0)
        B, N, _ = z0.shape
        t_arr = jnp.zeros((B,))
        net_out = self.phi(params, z0, t_arr, node_mask, edge_mask, context)
        sigma_0 = sigma_of(gamma_0)
        alpha_0 = alpha_of(gamma_0)
        mu_x = (z0 - sigma_0 * net_out) / alpha_0
        eps = sample_combined_position_feature_noise(
            key, B, N, node_mask, nd, self.diff_cfg.in_node_nf)
        xh = mu_x + sigma_x * eps
        x = xh[..., :nd] * self.diff_cfg.norm_values[0]
        # Parity: features come from z0 with the LAST class channel dropped.
        h_cat = z0[..., nd:-1] * self.diff_cfg.norm_values[1] * node_mask
        labels = jnp.argmax(h_cat, axis=-1)
        h = jax.nn.one_hot(labels, self.diff_cfg.in_node_nf) * node_mask
        return x, h

    # -- forward diffusion of a known latent (used by inpaint / merge) -------

    def forward_diffuse(self, params, key, z_known, s_idx, gamma, node_mask):
        gamma_s = gamma[s_idx]
        B, N, _ = z_known.shape
        eps = sample_combined_position_feature_noise(
            key, B, N, node_mask, self.diff_cfg.n_dims, self.diff_cfg.in_node_nf)
        return alpha_of(gamma_s) * z_known + sigma_of(gamma_s) * eps

    # -- full trajectories ---------------------------------------------------

    def generate(self, params, key, gamma, node_mask, edge_mask, context,
                 resample_steps: int = 0):
        """Plain ancestral sampling (reference ``forward`` :365-421)."""
        T = self.diff_cfg.timesteps
        B, N, _ = node_mask.shape
        key, init_key = jax.random.split(key)
        z = sample_combined_position_feature_noise(
            init_key, B, N, node_mask, self.diff_cfg.n_dims,
            self.diff_cfg.in_node_nf)

        s_values = jnp.arange(T - 1, -1, -1)

        def step(carry, s_idx):
            z, key = carry
            for _ in range(resample_steps + 1):
                key, sub = jax.random.split(key)
                z = self.sample_p_zs_given_zt(
                    params, sub, z, s_idx, gamma, node_mask, edge_mask, context)
            return (z, key), None

        (z, key), _ = jax.lax.scan(step, (z, key), s_values)
        key, dec_key = jax.random.split(key)
        return self.decode_z0(params, dec_key, z, gamma, node_mask, edge_mask,
                              context)

    def inpaint(self, params, key, gamma, node_mask, edge_mask, context,
                z_known, fixed_mask, resample_steps: int = 1,
                blend_power: int = 3):
        """Fragment-fixed generation with soft polynomial blending (:423-513)."""
        resample_steps = max(resample_steps, 1)
        T = self.diff_cfg.timesteps
        B, N, _ = node_mask.shape
        key, init_key = jax.random.split(key)
        z = sample_combined_position_feature_noise(
            init_key, B, N, node_mask, self.diff_cfg.n_dims,
            self.diff_cfg.in_node_nf)

        s_values = jnp.arange(T - 1, -1, -1)

        def step(carry, s_idx):
            z, key = carry
            s_norm = s_idx.astype(gamma.dtype) / T
            blend = (1.0 - s_norm) ** blend_power
            for _ in range(resample_steps):
                key, k1, k2 = jax.random.split(key, 3)
                z = self.sample_p_zs_given_zt(
                    params, k1, z, s_idx, gamma, node_mask, edge_mask, context)
                z_known_noised = self.forward_diffuse(
                    params, k2, z_known, s_idx, gamma, node_mask)
                z_known_noised = align_fragment_com_to_generated(
                    z_known_noised, z, fixed_mask)
                z = (blend * z_known_noised * fixed_mask
                     + (1 - blend) * z * fixed_mask
                     + z * (1 - fixed_mask))
            key, k3 = jax.random.split(key)
            z = self.sample_p_zs_given_zt(
                params, k3, z, s_idx, gamma, node_mask, edge_mask, context)
            return (z, key), None

        (z, key), _ = jax.lax.scan(step, (z, key), s_values)
        key, dec_key = jax.random.split(key)
        return self.decode_z0(params, dec_key, z, gamma, node_mask, edge_mask,
                              context)

    def merge_fragments(self, params, key, gamma, node_mask, edge_mask,
                        fixed_mask, context, z_known,
                        diffusion_level: int = 50, resample_steps: int = 1,
                        blend_power: int = 3):
        """Merge fixed + generated fragments by partial re-diffusion (:515-607).

        ``diffusion_level`` must be a static Python int: the scan range is
        trimmed to s <= diffusion_level at trace time (the reference skips those
        steps with a Python ``continue``).
        """
        resample_steps = max(resample_steps, 1)
        T = self.diff_cfg.timesteps
        key, noise_key = jax.random.split(key)
        z = self.forward_diffuse(params, noise_key, z_known,
                                 jnp.asarray(diffusion_level), gamma, node_mask)

        start = min(diffusion_level, T - 1)
        s_values = jnp.arange(start, -1, -1)

        def step(carry, s_idx):
            z, key = carry
            s_norm = s_idx.astype(gamma.dtype) / T
            blend = (1.0 - s_norm) ** blend_power
            for _ in range(resample_steps):
                key, k1, k2 = jax.random.split(key, 3)
                z = self.sample_p_zs_given_zt(
                    params, k1, z, s_idx, gamma, node_mask, edge_mask, context)
                z_fixed_noised = self.forward_diffuse(
                    params, k2, z_known, s_idx, gamma, node_mask)
                z_fixed_noised = align_fragment_com_to_generated(
                    z_fixed_noised, z, fixed_mask)
                z = (blend * z_fixed_noised * fixed_mask
                     + (1 - blend) * z * fixed_mask
                     + z * (1 - fixed_mask))
            return (z, key), None

        (z, key), _ = jax.lax.scan(step, (z, key), s_values)
        key, dec_key = jax.random.split(key)
        return self.decode_z0(params, dec_key, z, gamma, node_mask, edge_mask,
                              context)
