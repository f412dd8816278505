"""Polynomial noise schedule for the EDM sampler.

Behavioural reference: ``/root/reference/src/mlconfgen/equivariant_diffusion.py``
(``clip_noise_schedule`` :9-24, ``polynomial_schedule`` :27-45,
``PredefinedNoiseSchedule`` :108-134). The schedule is precomputed host-side as
a plain array; inside jitted samplers it is a constant-folded lookup table.
"""

from __future__ import annotations

import numpy as np


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step ratio alpha_t^2/alpha_{t-1}^2 for sampling stability."""
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, clip_value, 1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4,
                        power: int = 2) -> np.ndarray:
    """``alpha^2`` schedule 1 - (t/T)^power, squared, clipped, precision-scaled."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def gamma_schedule(timesteps: int, precision: float = 1e-5,
                   power: int = 2) -> np.ndarray:
    """Gamma lookup table: gamma_t = -log(alpha_t^2 / sigma_t^2), length T+1.

    Indexed by the integer timestep (``round(t * T)`` in the reference's
    ``PredefinedNoiseSchedule.forward``).
    """
    alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
    sigmas2 = 1 - alphas2
    log_alphas2 = np.log(alphas2)
    log_sigmas2 = np.log(sigmas2)
    return -(log_alphas2 - log_sigmas2).astype(np.float32)
