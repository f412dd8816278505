"""Training driver: epochs of sharded EDM steps with prefetch + checkpoints.

Completes the training stack (the reference is inference-only; SURVEY.md §5
checkpoint/resume plan): data pipeline (:mod:`.data`) -> mesh-sharded train
step (:mod:`.step`) -> periodic ``.npz`` checkpoints via
:mod:`..checkpoint`.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import save_params
from ..config import DiffusionConfig, EGNNConfig
from ..diffusion.schedule import gamma_schedule
from ..models.egnn import init_egnn_params
from ..parallel.mesh import make_mesh
from .data import MoleculeDataset, batches, prefetch
from .step import init_train_state, make_optimizer, make_train_step

__all__ = ["train"]


def train(dataset: MoleculeDataset, *, egnn_cfg: EGNNConfig,
          diff_cfg: Optional[DiffusionConfig] = None, batch_size: int = 64,
          epochs: int = 1, lr: float = 1e-4, seed: int = 0,
          mesh=None, params=None, checkpoint_path: Optional[str] = None,
          checkpoint_every: int = 500, log_every: int = 50,
          ema_decay: float = 0.0, cosine_lr: bool = False,
          warmup_steps: int = 0,
          log_fn: Callable[[str], None] = print) -> Dict:
    """Train the EGNN denoiser; returns {params, ema_params, opt_state,
    history}.

    ``ema_decay`` > 0 maintains an exponential moving average of the
    parameters (the standard EDM inference weights; e.g. 0.999) — when
    enabled, checkpoints save the EMA parameters. ``cosine_lr`` decays the
    learning rate over the planned step budget (``make_optimizer``).
    """
    diff_cfg = diff_cfg or DiffusionConfig()
    mesh = mesh or make_mesh((len(jax.devices()), 1))
    key = jax.random.PRNGKey(seed)
    if params is None:
        key, init_key = jax.random.split(key)
        params = init_egnn_params(init_key, egnn_cfg)

    steps_per_epoch = max(len(dataset) // max(batch_size, 1), 1)
    optimizer = make_optimizer(
        lr=lr, total_steps=epochs * steps_per_epoch if cosine_lr else 0,
        warmup_steps=warmup_steps)
    opt_state = init_train_state(params, optimizer)
    step_fn = make_train_step(mesh, egnn_cfg, diff_cfg, optimizer)

    ema_params = jax.tree.map(jnp.asarray, params) if ema_decay > 0 else None

    @jax.jit
    def ema_update(ema, p, t):
        # Warmup (min(decay, (1+t)/(10+t))): without it a run of S steps
        # keeps decay^S of the INITIAL RANDOM weights in the average —
        # 0.999^1200 ~= 30%, which destroys sample quality on short runs
        # (measured: 0/24 valid molecules in the width-64 CPU rehearsal vs
        # nonzero with the warmup).
        d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
        return jax.tree.map(lambda e, q: d * e + (1.0 - d) * q, ema, p)
    gamma = jnp.asarray(gamma_schedule(diff_cfg.timesteps,
                                       diff_cfg.noise_precision,
                                       diff_cfg.schedule_power))

    rng = np.random.default_rng(seed)
    history = []
    step = 0
    t0 = time.perf_counter()
    for epoch in range(epochs):
        it = prefetch(batches(dataset, batch_size, rng=rng))
        for batch in it:
            key, sub = jax.random.split(key)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, metrics = step_fn(params, opt_state, sub, jb,
                                                 gamma)
            if ema_params is not None:
                ema_params = ema_update(ema_params, params,
                                        jnp.float32(step))
            step += 1
            if step % log_every == 0:
                loss = float(metrics["loss"])
                history.append({"step": step, "epoch": epoch, "loss": loss})
                rate = step * batch_size / (time.perf_counter() - t0)
                log_fn(f"[train] epoch {epoch} step {step} "
                       f"loss {loss:.5f} ({rate:.1f} mol/s)")
            if checkpoint_path and step % checkpoint_every == 0:
                save_params(checkpoint_path,
                            params if ema_params is None else ema_params)
    if checkpoint_path:
        save_params(checkpoint_path,
                    params if ema_params is None else ema_params)
    return {"params": params, "ema_params": ema_params,
            "opt_state": opt_state, "history": history}
