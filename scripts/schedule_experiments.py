#!/usr/bin/env python
"""XLA schedule experiments on the production denoiser forward.

Round-3 verdict item 4: the forward runs at 30 ms vs a ~23 ms
compute+bandwidth roofline (PERF.md); the one Pallas fusion attempt lost to
XLA's schedule, so the remaining levers are XLA's own scheduling knobs.
This script times the full 420x9 denoiser forward (scan-amortized — one
jitted dispatch runs LOOPS forwards, hiding the ~1.4 ms tunnel latency)
under several compiler-option configurations and prints one ms/forward line
per config.

Options are passed per-executable via ``.lower().compile(compiler_options=
...)`` — DebugOptions proto fields, which the axon remote-compile tunnel
forwards (terminal log: "proto-backed xla_* flags are forwarded
per-compile") — so no XLA_FLAGS env parsing is involved and an option the
backend rejects fails that config only.

Usage: python scripts/schedule_experiments.py [--loops 20] [--batch 128]
"""

import argparse
import json
import time

CONFIGS = {
    "baseline": {},
    # bigger VMEM budget for fusions (v5e default scoped limit ~64 MiB class)
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler on/off (overlap HBM streaming with compute)
    "lhs_on": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "lhs_on_vmem": {"xla_tpu_enable_latency_hiding_scheduler": "true",
                    "xla_tpu_scoped_vmem_limit_kib": "131072"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--workload", default="forward",
                    choices=["forward", "sampler"],
                    help="'forward': one denoiser forward, scan-amortized; "
                         "'sampler': the full 100-step generate program "
                         "(includes per-step RNG + elementwise updates)")
    ap.add_argument("--steps", type=int, default=100,
                    help="sampler workload: diffusion steps")
    ap.add_argument("--rng", default=None, choices=["threefry2x32", "rbg"],
                    help="override jax_default_prng_impl (rbg is much "
                         "cheaper on TPU; affects the sampler workload's "
                         "per-step noise draws)")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    import jax

    if args.rng:
        jax.config.update("jax_default_prng_impl", args.rng)

    import jax.numpy as jnp
    import numpy as np

    from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
    from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                        init_egnn_params)
    from ml_conformer_generator_tpu.utils.masks import prepare_masks

    B, LOOPS, N = args.batch, args.loops, 42
    cfg = EGNNConfig(compute_dtype="bfloat16")
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(25, 40, size=B)), N)
    xh = jnp.asarray(rng.standard_normal((B, N, 11)),
                     dtype=jnp.float32) * node_mask
    ctx = jnp.asarray(rng.standard_normal((B, N, 3)),
                      dtype=jnp.float32) * node_mask
    t = jnp.full((B,), 0.5, dtype=jnp.float32)

    if args.workload == "sampler":
        from ml_conformer_generator_tpu.diffusion.edm import EDMSampler
        from ml_conformer_generator_tpu.diffusion.schedule import \
            gamma_schedule

        sampler = EDMSampler(cfg, DiffusionConfig(timesteps=args.steps))
        gamma = jnp.asarray(gamma_schedule(args.steps))
        LOOPS = 1          # the T-step scan is already dispatch-amortized

        def run(key):
            return sampler.generate(params, key, gamma, node_mask,
                                    edge_mask, ctx)

        example = jax.random.PRNGKey(7)
    else:
        def run(xh):
            def body(carry, _):
                out = dynamics_forward(params, t, carry, node_mask,
                                       edge_mask, ctx, cfg)
                # feed a slice of the output back: iterations stay dependent
                return carry + 1e-6 * out[..., :11], None
            out, _ = jax.lax.scan(body, xh, None, length=LOOPS)
            return out

        example = xh

    lowered = jax.jit(run).lower(example)
    results = {}
    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    for name in names:
        opts = CONFIGS[name]
        try:
            t0 = time.perf_counter()
            exe = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
            jax.block_until_ready(exe(example))      # warm
            t0 = time.perf_counter()
            jax.block_until_ready(exe(example))
            ms = (time.perf_counter() - t0) / LOOPS * 1e3
            results[name] = round(ms, 3)
            print(f"{name:14s} {ms:7.2f} ms/forward  "
                  f"(compile {compile_s:.1f}s; {opts or 'no options'})",
                  flush=True)
        except Exception as e:
            results[name] = None
            print(f"{name:14s}   FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
