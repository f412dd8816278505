"""EDM training objective.

The reference ships no training code (SURVEY.md: inference-only); this module
completes the framework with the standard E(3) diffusion training loss the
published EDM checkpoints were trained with: sample a timestep, forward-diffuse
the clean latent, and regress the injected noise with an L2 objective over
masked nodes (Hoogeboom et al. 2022 EDM, eps-parameterisation).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import DiffusionConfig, EGNNConfig
from ..diffusion.edm import (alpha_of,
                             sample_combined_position_feature_noise, sigma_of)
from ..models.egnn import dynamics_forward, remove_mean_with_mask


def edm_training_loss(params, key, x, h, node_mask, edge_mask, context, gamma,
                      egnn_cfg: EGNNConfig, diff_cfg: DiffusionConfig,
                      dynamics_fn: Callable = dynamics_forward
                      ) -> Tuple[jnp.ndarray, dict]:
    """Mean eps-prediction MSE over a batch of clean molecules.

    x: (B, N, 3) zero-CoM positions; h: (B, N, F) one-hot / scaled features;
    gamma: (T+1,) schedule table. ``dynamics_fn`` may be the edge-sharded
    variant when running under shard_map.
    """
    B, N, _ = x.shape
    T = diff_cfg.timesteps
    k_t, k_eps = jax.random.split(key)

    # Timestep per sample: t in {0..T}, normalised.
    t_int = jax.random.randint(k_t, (B,), 0, T + 1)
    gamma_t = gamma[t_int]
    alpha_t = alpha_of(gamma_t).reshape(B, 1, 1)
    sigma_t = sigma_of(gamma_t).reshape(B, 1, 1)

    # Normalise features as the sampler expects (norm_values).
    x_n = x / diff_cfg.norm_values[0]
    h_n = h / diff_cfg.norm_values[1]
    z0 = jnp.concatenate([x_n, h_n], axis=-1)

    eps = sample_combined_position_feature_noise(
        k_eps, B, N, node_mask, diff_cfg.n_dims, diff_cfg.in_node_nf)
    z_t = alpha_t * z0 + sigma_t * eps
    # keep positions zero-CoM after the convex combination
    z_t = jnp.concatenate(
        [remove_mean_with_mask(z_t[..., :diff_cfg.n_dims], node_mask),
         z_t[..., diff_cfg.n_dims:]], axis=-1)

    t_norm = t_int.astype(z_t.dtype) / T
    eps_pred = dynamics_fn(params, t_norm, z_t, node_mask, edge_mask, context,
                           egnn_cfg)

    err = (eps_pred - eps) ** 2 * node_mask
    denom = jnp.sum(node_mask) * eps.shape[-1]
    loss = jnp.sum(err) / denom
    metrics = {"loss": loss, "mean_t": jnp.mean(t_norm)}
    return loss, metrics
