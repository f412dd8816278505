#!/usr/bin/env python
"""Headline benchmark: EDM generation throughput on one TPU chip.

Measures raw samples/s through the full-size generation stack — the 420-wide
9-block EGNN denoiser driven for the full 100-step reverse diffusion as ONE
jitted program, plus the AdjMatSeer bond-prediction forward — at the
reference's published working point (100 denoising steps, 42-node padded
graphs; reference ``README.md:104-121``).

Baseline: the reference generates 4.18 *valid* molecules/s on an NVIDIA H100
at 48% post-standardization validity (`BASELINE.md`), i.e. ~8.71 raw
samples/s through the device pipeline. ``vs_baseline`` is raw samples/s
against that 8.71/s H100 figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_RAW_SAMPLES_PER_S = 4.18 / 0.48  # H100, README.md:108-115


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--nodes", type=int, default=42)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="MXU compute precision for the denoiser MLPs")
    ap.add_argument("--pallas", default=None, choices=["on", "off", "auto"],
                    help="override EGNNConfig.use_pallas")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of one timed repeat")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ml_conformer_generator_tpu.config import (CONTEXT_NORMS,
                                                   AdjMatSeerConfig,
                                                   DiffusionConfig, EGNNConfig)
    from ml_conformer_generator_tpu.diffusion.edm import EDMSampler
    from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
    from ml_conformer_generator_tpu.models.adj_mat_seer import (
        adj_mat_seer_forward, init_adj_mat_seer_params)
    from ml_conformer_generator_tpu.models.egnn import init_egnn_params
    from ml_conformer_generator_tpu.utils.masks import prepare_edm_input

    dev = jax.devices()[0]
    egnn_kw = {"compute_dtype": args.dtype}
    if args.pallas is not None:
        egnn_kw["use_pallas"] = args.pallas
    egnn_cfg = EGNNConfig(**egnn_kw)  # production size: 420 x 9
    diff_cfg = DiffusionConfig(timesteps=args.steps)
    adj_cfg = AdjMatSeerConfig()

    key = jax.random.PRNGKey(0)
    params = init_egnn_params(key, egnn_cfg)
    adj_params = init_adj_mat_seer_params(jax.random.PRNGKey(1), adj_cfg)
    sampler = EDMSampler(egnn_cfg, diff_cfg)
    gamma = jnp.asarray(gamma_schedule(args.steps))

    B, N = args.batch, args.nodes
    node_mask, edge_mask, context, _ = prepare_edm_input(
        jax.random.PRNGKey(2), B, jnp.asarray([105.0, 473.0, 537.0]),
        CONTEXT_NORMS, min_n_nodes=25, max_n_nodes=min(39, N - 1),
        n_nodes_pad=N)

    gen = jax.jit(lambda p, k: sampler.generate(p, k, gamma, node_mask,
                                                edge_mask, context))
    adj_fwd = jax.jit(lambda p, e, d, a: adj_mat_seer_forward(p, e, d, a,
                                                              adj_cfg))

    # Representative padded bond-predictor inputs (content-independent cost).
    D = adj_cfg.dimension
    elements = jnp.zeros((B, D), dtype=jnp.int32)
    dist = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, D, D)))
    adj = (dist < 1.0).astype(jnp.float32)

    # Warmup / compile.
    x, h = gen(params, jax.random.PRNGKey(10))
    logits = adj_fwd(adj_params, elements, dist, adj)
    jax.block_until_ready((x, h, logits))

    times = []
    for i in range(args.repeats):
        if args.profile and i == 1:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        x, h = gen(params, jax.random.PRNGKey(100 + i))
        logits = adj_fwd(adj_params, elements, dist, adj)
        jax.block_until_ready((x, h, logits))
        times.append(time.perf_counter() - t0)
        if args.profile and i == 1:
            jax.profiler.stop_trace()

    best = min(times)
    samples_per_s = B / best
    print(json.dumps({
        "metric": "edm_samples_per_s",
        "value": round(samples_per_s, 3),
        "unit": f"samples/s (batch {B}, {args.steps} steps, N={N}, "
                f"{dev.platform})",
        "vs_baseline": round(samples_per_s / REFERENCE_RAW_SAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
