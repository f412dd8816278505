#!/usr/bin/env python
"""Microbenchmark: fused Pallas edge pass vs the XLA dense GCL path.

Times one GCL edge-aggregate pass (the sampler's dominant cost: 18 of these
plus 9 coord passes per denoiser step) at the production working point
(B=128, N=42, H=420, bf16). Used to tune the kernel blocking; results feed
the `use_pallas` default decision in `EGNNConfig` (see ops/gcl_kernel.py
module docstring).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    from ml_conformer_generator_tpu.config import EGNNConfig
    from ml_conformer_generator_tpu.models.egnn import (gcl_forward,
                                                        init_gcl_params,
                                                        np_rng_from_key)
    from ml_conformer_generator_tpu.ops import gcl_kernel

    cfg = EGNNConfig()
    B, N, H = args.batch, 42, cfg.hidden_nf
    cd = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    params = init_gcl_params(np_rng_from_key(jax.random.PRNGKey(0)), cfg,
                             dtype=cd)
    h = jnp.asarray(rng.standard_normal((B, N, H)), dtype=cd)
    ef = jnp.asarray(rng.standard_normal((B, N, N, 2)), dtype=cd)
    nm = jnp.ones((B, N, 1), cd)
    em = jnp.ones((B, N, N, 1), cd)

    flops = B * 2 * N * N * H * H  # main GEMM only (lower bound)
    LOOPS = 30  # scan iterations per dispatch: amortizes axon tunnel latency

    def scan_time(pass_fn):
        """ms per pass, measured as a LOOPS-long scan in ONE dispatch."""
        @jax.jit
        def run(h):
            def body(h, _):
                out = pass_fn(h)
                # feed output back so scan iterations can't be elided
                return h + 1e-6 * out.astype(h.dtype), None
            h, _ = jax.lax.scan(body, h, None, length=LOOPS)
            return h
        return timeit(run, h, repeats=5) / LOOPS

    t = scan_time(lambda h: gcl_forward(params, h, ef, nm, em, 100.0, None))
    print(f"xla dense gcl_forward      : {t:8.3f} ms/pass  "
          f"({flops / (t * 1e-3) / 1e12:.1f} TFLOP/s main-GEMM lower bound)")

    t = scan_time(lambda h: gcl_kernel.gcl_edge_aggregate(
        params, h, ef, em, 100.0))
    print(f"pallas gcl_edge_aggregate  : {t:8.3f} ms/pass  "
          f"({flops / (t * 1e-3) / 1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
