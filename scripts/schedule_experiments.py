#!/usr/bin/env python
"""XLA schedule-flag experiments on the production denoiser forward.

Round-3 verdict item 4: the forward runs at 30 ms vs a ~23 ms
compute+bandwidth roofline (PERF.md); the one Pallas fusion attempt lost to
XLA's schedule, so the remaining levers are XLA's own scheduling knobs.
This script times the full 420x9 denoiser forward (scan-amortized — one
jitted dispatch runs LOOPS forwards, hiding the ~1.4 ms tunnel latency)
under several XLA_FLAGS configurations, each in a fresh subprocess (flags
are per-process), and prints one ms/forward line per config.

The flags are DebugOptions-backed, so the remote-compile tunnel forwards
them per-compile (axon terminal log: "proto-backed xla_* flags are
forwarded"). An invalid flag fails that subprocess only.

Usage: python scripts/schedule_experiments.py [--loops 20] [--batch 128]
"""

import argparse
import json
import os
import subprocess
import sys

CONFIGS = {
    "baseline": "",
    # bigger VMEM budget for fusions (default scoped limit is ~64 MiB class)
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    # latency-hiding scheduler: overlap HBM copies with compute more
    # aggressively
    "lhs_on": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "lhs_off": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "lhs_on_vmem": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                    "--xla_tpu_scoped_vmem_limit_kib=131072"),
}

_CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                    init_egnn_params)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

B, LOOPS = %(batch)d, %(loops)d
cfg = EGNNConfig(compute_dtype="bfloat16")
params = init_egnn_params(jax.random.PRNGKey(0), cfg)
N = 42
rng = np.random.default_rng(0)
node_mask, edge_mask = prepare_masks(
    jnp.asarray(rng.integers(25, 40, size=B)), N)
xh = jnp.asarray(rng.standard_normal((B, N, 11)), dtype=jnp.float32) \
    * node_mask
ctx = jnp.asarray(rng.standard_normal((B, N, 3)), dtype=jnp.float32) \
    * node_mask
t = jnp.full((B,), 0.5, dtype=jnp.float32)

@jax.jit
def run(xh):
    def body(carry, _):
        out = dynamics_forward(params, t, carry, node_mask, edge_mask, ctx,
                               cfg)
        # feed a slice of the output back so iterations are dependent
        return carry + 1e-6 * out[..., :11], None
    out, _ = jax.lax.scan(body, xh, None, length=LOOPS)
    return out

jax.block_until_ready(run(xh))          # compile
t0 = time.perf_counter()
jax.block_until_ready(run(xh))
dt = time.perf_counter() - t0
print(json.dumps({"ms_per_forward": dt / LOOPS * 1e3}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--timeout", type=float, default=420.0)
    args = ap.parse_args()

    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    child = _CHILD % {"batch": args.batch, "loops": args.loops}
    results = {}
    for name in names:
        env = dict(os.environ)
        flags = CONFIGS[name]
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # each config gets a fresh process AND must not reuse the persistent
        # cache of another flag set (flags are part of the cache key, but be
        # explicit: separate cache dir per config)
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jxcache_{name}"
        try:
            out = subprocess.run(
                [sys.executable, "-c", child], env=env, timeout=args.timeout,
                capture_output=True, text=True)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode == 0 and line:
                results[name] = json.loads(line[-1])["ms_per_forward"]
                print(f"{name:14s} {results[name]:7.2f} ms/forward "
                      f"({flags or 'no flags'})", flush=True)
            else:
                err = (out.stderr or "").strip().splitlines()
                results[name] = None
                print(f"{name:14s}   FAILED rc={out.returncode} "
                      f"{err[-1] if err else ''}", flush=True)
        except subprocess.TimeoutExpired:
            results[name] = None
            print(f"{name:14s}   TIMEOUT (tunnel wedge?)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
