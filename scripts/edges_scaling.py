#!/usr/bin/env python
"""Edge-messages/s of the EGNN denoiser: 1 chip and N-device meshes.

The north-star efficiency metric (BASELINE.json: "EGNN edges/s at
1-chip/1-host/N-host", ">=80% edges/s scaling") counts per-edge MLP
evaluations: one denoiser forward at batch B and N nodes computes
``B * N^2`` edge messages in each of ``n_blocks * 3`` edge passes
(2 GCLs + 1 coordinate update per block, reference ``egnn.py:152-222``).

Modes:

* default — dense single-device forward (`models.egnn.dynamics_forward`) on
  whatever backend JAX picked: the 1-chip number on TPU.
* ``--mesh DxE`` — the edge+data-sharded forward
  (`parallel.edge_shard.dynamics_forward_sharded`) over a (data=D, edge=E)
  mesh. With ``--devices M`` the script forces an M-device *virtual CPU*
  mesh (XLA_FLAGS) — that validates the sharded program end-to-end and its
  collective overhead, but virtual devices share one CPU so the absolute
  number is NOT a scaling measurement; run on a real pod slice for that.

Timing is scan-amortized (many forwards per dispatch) because this
machine's TPU tunnel costs ~1.4 ms per dispatch.

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=42)
    ap.add_argument("--loops", type=int, default=20,
                    help="forwards per dispatch (scan length)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--hidden", type=int, default=None,
                    help="override hidden width (CPU validation runs: "
                         "the 420-wide production net takes minutes to "
                         "compile on CPU)")
    ap.add_argument("--blocks", type=int, default=None)
    ap.add_argument("--mesh", default=None, metavar="DxE",
                    help="data x edge mesh shape for the sharded forward")
    ap.add_argument("--devices", type=int, default=None,
                    help="force an N-device virtual CPU platform")
    args = ap.parse_args()

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ml_conformer_generator_tpu.config import EGNNConfig
    from ml_conformer_generator_tpu.models.egnn import (dynamics_forward,
                                                        init_egnn_params)
    from ml_conformer_generator_tpu.parallel.edge_shard import (
        EDGE_AXIS, dynamics_forward_sharded)
    from ml_conformer_generator_tpu.parallel.sampler import DATA_AXIS
    from ml_conformer_generator_tpu.utils.masks import prepare_masks

    cfg_kw = {"compute_dtype": args.dtype}
    if args.hidden:
        cfg_kw["hidden_nf"] = args.hidden
    if args.blocks:
        cfg_kw["n_blocks"] = args.blocks
    cfg = EGNNConfig(**cfg_kw)
    B, N = args.batch, args.nodes
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(25, min(40, N), size=B)), N)
    xh = jnp.asarray(rng.standard_normal((B, N, 11)),
                     dtype=jnp.float32) * node_mask
    context = jnp.asarray(rng.standard_normal((B, N, 3)),
                          dtype=jnp.float32) * node_mask
    t0_arr = jnp.full((B,), 0.5, dtype=jnp.float32)

    if args.mesh:
        d, e = (int(v) for v in args.mesh.lower().split("x"))
        devs = np.asarray(jax.devices()[: d * e]).reshape(d, e)
        mesh = Mesh(devs, (DATA_AXIS, EDGE_AXIS))
        assert B % d == 0 and N % e == 0, "B % data, N % edge must be 0"

        def fwd(params, t, xh, nm, em_l, ctx):
            return dynamics_forward_sharded(params, t, xh, nm, em_l, ctx,
                                            cfg, EDGE_AXIS)

        fwd = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS, None, EDGE_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS))
        desc = f"mesh data={d} x edge={e} ({jax.devices()[0].platform})"
    else:
        def fwd(params, t, xh, nm, em, ctx):
            return dynamics_forward(params, t, xh, nm, em, ctx, cfg)
        desc = f"1 device ({jax.devices()[0].platform})"

    @jax.jit
    def run(xh):
        def body(xh, _):
            out = fwd(params, t0_arr, xh, node_mask, edge_mask, context)
            return xh + 1e-6 * out, None
        xh, _ = jax.lax.scan(body, xh, None, length=args.loops)
        return xh

    jax.block_until_ready(run(xh))  # compile
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(xh))
        best = min(best, time.perf_counter() - t0)

    passes = cfg.n_blocks * 3
    edges_per_fwd = B * N * N * passes
    eps = edges_per_fwd * args.loops / best
    print(json.dumps({
        "metric": "egnn_edge_messages_per_s",
        "value": round(eps / 1e9, 3),
        "unit": f"G edge-messages/s (B={B}, N={N}, {passes} passes/fwd, "
                f"{args.dtype}, {desc})",
        "ms_per_forward": round(best / args.loops * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
