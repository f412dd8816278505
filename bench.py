#!/usr/bin/env python
"""Headline benchmark: EDM generation throughput on one TPU chip.

Measures raw samples/s through the full-size generation stack — the 420-wide
9-block EGNN denoiser driven for the full 100-step reverse diffusion as ONE
jitted program, plus the AdjMatSeer bond-prediction forward — at the
reference's published working point.

Workloads:

* ``--workload screen`` (default): replays the reference's evaluation
  protocol (``research_scripts/evaluation.py``: per-reference requests,
  sample sizes drawn in [n_ref - variance, n_ref + variance] with
  variance=2, references spanning 15-39 heavy atoms). Like the reference —
  which pads each request to its own ``max_n_nodes``
  (``conformer_generator.py:130,166-167``; ``mol_utils.py:276-280``) — each
  request runs at its own bucketed node count, so this measures the same
  mixed-size distribution the H100 baseline numbers were measured on.
* ``--workload fixed``: every sample at the worst-case padded size
  (``--nodes``, default 42) — the conservative lower bound reported by
  earlier rounds.
* ``--workload e2e``: the north-star metric — valid molecules/s through the
  FULL public pipeline (jitted sampler -> host chemistry -> bond predictor ->
  standardiser) via ``ScreeningDriver``, with per-stage split and host/device
  overlap ratio.

Phase order of the default screen workload (each phase is gated on the
remaining ``--time-budget`` and logged with a wall-clock timestamp on stderr,
so the judged artifact can never silently starve a later phase):

1. coarse-bucket screen measurement (the guaranteed headline),
2. e2e through ScreeningDriver over SYNTHETIC references drawn from the same
   15-39 heavy-atom protocol distribution as phase 1 (protocol-comparable),
3. e2e over the reference demo conformers (the round-3 figure, for
   continuity),
4. exact-size padding refinement (one compiled program per distinct request
   size; only economical when the persistent compile cache is warm).

Baseline: the reference generates 4.18 *valid* molecules/s on an NVIDIA H100
at 48% post-standardization validity (`BASELINE.md`), i.e. ~8.71 raw
samples/s through the device pipeline. ``vs_baseline`` is raw samples/s
against that 8.71/s H100 figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import glob
import json
import sys
import time
from typing import List, Optional

sys.path.insert(0, "/root/repo")

REFERENCE_RAW_SAMPLES_PER_S = 4.18 / 0.48  # H100, README.md:108-115
REFERENCE_VALID_MOL_PER_S = 4.18           # H100, README.md:109
REFERENCE_VALIDITY = 0.48                  # README.md:115

T0 = time.perf_counter()


_LAST_NOTE = ["start"]


def note(msg: str) -> None:
    """Timestamped phase log on stderr (stdout stays one JSON line).

    Round-3 lesson: the driver-captured run burned ~600 s that no log line
    accounted for (BENCH_r03.json), so every phase boundary and every timed
    repeat now stamps elapsed wall-clock — a tunnel stall mid-run becomes a
    visible gap between two stamps instead of a mystery.
    """
    _LAST_NOTE[0] = msg
    print(f"[bench t={time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def acquire_backend(time_budget_s: float,
                    min_reserve_s: float = 300.0,
                    retry_rest_s: float = 90.0):
    """Backend-acquisition loop: the CLAUDE.md outage-recovery recipe, in code.

    This machine's TPU backend (a remote tunnel) fails two ways: (a) backend
    init *raises* (BENCH_r04.json died in the first 5 s of a 900 s budget this
    way), or (b) init/first-dispatch *hangs* indefinitely (the round-4 wedge).
    Both are usually transient — the documented recovery is "rest 1-6 min and
    retry". So: run init + a tiny real dispatch in a daemon thread; on an
    exception the thread clears cached backend state, rests, and retries; on a
    hang the main thread simply keeps waiting on the same in-flight attempt
    (the tunnel relay is a dumb pipe — a stalled dispatch completes when the
    remote side recovers). Give up only when less than ``min_reserve_s`` of
    the budget remains, returning the attempt log so a failed artifact is
    still diagnosable (instead of a bare stack trace like BENCH_r04.json).

    Returns (platform_name | None, attempts_log).
    """
    import threading

    state = {"platform": None, "done": False}
    attempts: list = []

    def _try_forever() -> None:
        while not state["done"]:
            t0 = time.perf_counter()
            try:
                import jax
                import jax.numpy as jnp
                dev = jax.devices()[0]
                # jax.devices() can succeed while real dispatches hang
                # (dev-notes wedge pattern) — probe an actual compiled op.
                x = jnp.ones((128, 128))
                jax.block_until_ready(x @ x)
                attempts.append({
                    "t_s": round(time.perf_counter() - T0, 1), "ok": True,
                    "probe_s": round(time.perf_counter() - t0, 1)})
                state["platform"] = dev.platform
                state["done"] = True
                return
            except Exception as exc:  # noqa: BLE001 — log + retry is the point
                attempts.append({
                    "t_s": round(time.perf_counter() - T0, 1), "ok": False,
                    "probe_s": round(time.perf_counter() - t0, 1),
                    "error": f"{type(exc).__name__}: {exc}"[:400]})
                note(f"backend probe FAILED "
                     f"({attempts[-1]['probe_s']:.0f}s): "
                     f"{attempts[-1]['error'].splitlines()[0][:120]}")
                try:
                    # drop any cached failed-backend state so the retry
                    # re-runs platform init instead of replaying the failure
                    from jax.extend.backend import clear_backends
                    clear_backends()
                except Exception:  # noqa: BLE001
                    pass
                time.sleep(retry_rest_s)

    worker = threading.Thread(target=_try_forever, daemon=True)
    worker.start()
    next_log = 60.0
    while True:
        left = time_budget_s - (time.perf_counter() - T0)
        worker.join(timeout=5.0)
        if state["done"]:
            note(f"backend up: {state['platform']} "
                 f"(acquired after {len(attempts)} attempt(s))")
            return state["platform"], attempts
        if left < min_reserve_s:
            if not attempts:
                # the in-flight attempt never completed (hang, or still
                # importing) — record that so the artifact is never an
                # empty log
                attempts.append({
                    "t_s": round(time.perf_counter() - T0, 1), "ok": False,
                    "error": "no probe completed within the budget "
                             "(backend init hang or slow import)"})
            note(f"backend unavailable after {len(attempts)} failed "
                 f"attempt(s) and {time.perf_counter() - T0:.0f}s waiting; "
                 f"{left:.0f}s budget left — giving up")
            return None, attempts
        if time.perf_counter() - T0 > next_log:
            note(f"still acquiring backend ({len(attempts)} failed "
                 f"attempt(s) so far, {left:.0f}s budget left)")
            next_log += 60.0


def _start_watchdog(period_s: float = 120.0) -> None:
    """Heartbeat thread: this machine's TPU tunnel can wedge a process at a
    compile/dispatch indefinitely (dev notes in CLAUDE.md); if that happens
    mid-bench the artifact should still show WHERE it hung."""
    import threading

    def beat():
        while True:
            time.sleep(period_s)
            print(f"[bench t={time.perf_counter() - T0:6.1f}s] watchdog: "
                  f"alive; last event: {_LAST_NOTE[0]}",
                  file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()


def make_protocol_refs(n_requests: int, seed: int = 0):
    """Synthetic reference conformers spanning the screen protocol's sizes.

    Sizes replay ``research_scripts/evaluation.py``'s working point (1000
    CCDC references of 15-39 heavy atoms); geometry is a self-avoiding
    random walk at 1.5 A steps — the pipeline only consumes the reference's
    coordinates (MOI -> 3-component context, ``ops/moi.py``), so this is the
    honest stand-in for the CCDC validation set (not redistributable here).
    With the same seed/protocol as the device-only screen phase, the e2e
    figure is directly comparable to the screen samples/s figure.
    """
    import numpy as np

    from ml_conformer_generator_tpu.chem.mol import Molecule

    rng = np.random.default_rng(seed)
    sizes = sorted(int(n) for n in rng.integers(15, 40, size=n_requests))
    refs = []
    for idx, n in enumerate(sizes):
        pos = [np.zeros(3)]
        while len(pos) < n:
            step = rng.normal(size=3)
            cand = pos[-1] + 1.5 * step / np.linalg.norm(step)
            # self-avoidance keeps the MOI in a molecule-like range
            if all(np.linalg.norm(cand - p) > 1.2 for p in pos[-8:]):
                pos.append(cand)
        refs.append(Molecule(np.full(n, 6), np.asarray(pos),
                             name=f"protocol_{idx}_n{n}"))
    return refs


def make_demo_refs(n_requests: int, min_n: int, max_n: int):
    from ml_conformer_generator_tpu.chem.io import read_mol_file

    pool = [read_mol_file(f).remove_hs()
            for f in sorted(glob.glob(
                "/root/reference/assets/demo_files/*.mol"))]
    pool = [m for m in pool if min_n <= m.num_atoms <= max_n]
    return [pool[i % len(pool)] for i in range(n_requests)]


def measure_e2e(gen, driver, refs: List, batch: int, variance: int,
                deadline: Optional[float] = None,
                weights_label: str = "untrained (random init; no trained "
                                     "weights found)") -> dict:
    """End-to-end valid-mol/s through the public pipeline (north-star metric).

    Drives ``ScreeningDriver.screen`` (the full ``generate_conformers``
    pipeline: jitted sampler -> host featurisation -> bond predictor ->
    standardiser), replaying the protocol of
    ``/root/reference/research_scripts/evaluation.py:45-268`` (n samples per
    reference, variance 2). Reports measured valid mol/s plus the raw
    pipeline rate and the implied valid mol/s at the reference's published
    48% validity — the honest proxy while weights are untrained (random
    weights produce ~0% chemically valid samples by construction).
    """
    import jax

    from ml_conformer_generator_tpu.utils.masks import pad_to_bucket

    def bucket_of(r):
        # must mirror ScreeningDriver._dispatch's node-axis bucketing
        return pad_to_bucket(min(r.num_atoms + variance, gen.max_n_nodes),
                             gen.node_bucket)

    # Warmup/compile: one request per distinct node-count bucket, abandoning
    # the phase (keeping the already-printed headline intact) if cold
    # compiles of the per-size programs threaten the wall-clock budget.
    seen, warm = set(), []
    for r in refs:
        if bucket_of(r) not in seen:
            seen.add(bucket_of(r))
            warm.append(r)
    for r in warm:
        t0 = time.perf_counter()
        driver.screen([r], n_samples=batch, variance=variance, score=False)
        note(f"e2e warm bucket N={bucket_of(r)} "
             f"({time.perf_counter() - t0:.1f}s)")
        if deadline is not None and time.perf_counter() - T0 > deadline:
            return {"skipped": "compile deadline during e2e warmup "
                               f"(bucket {gen.node_bucket})"}

    # Serial device time per distinct bucket (for overlap accounting —
    # different buckets run differently-sized programs).
    dev_s = {}
    for r in warm:
        t0 = time.perf_counter()
        d = driver._dispatch(r, batch, variance)
        jax.block_until_ready(d[1][:2])
        dev_s[bucket_of(r)] = time.perf_counter() - t0

    t0 = time.perf_counter()
    rep = driver.screen(refs, n_samples=batch, variance=variance, score=False)
    note(f"e2e measured {len(refs)} requests in "
         f"{time.perf_counter() - t0:.1f}s")
    wall = rep.total_gen_time_s
    m = dict(driver.last_metrics)
    device_total = sum(dev_s[bucket_of(r)] for r in refs)
    dev_s_per_req = device_total / max(len(refs), 1)
    host_s = m.get("host_chem_s", 0.0)
    saved = max(0.0, device_total + host_s + m.get("dispatch_s", 0.0) - wall)
    denom = min(device_total, host_s)
    overlap = round(min(1.0, saved / denom), 3) if denom > 1e-3 else None

    raw_per_s = rep.n_requested / wall
    return {
        "ref_sizes": sorted(r.num_atoms for r in refs),
        "valid_mol_per_s": round(rep.n_valid / wall, 3),
        "validity": round(rep.n_valid / rep.n_requested, 4),
        "raw_mol_per_s": round(raw_per_s, 3),
        "implied_valid_mol_per_s_at_ref_validity":
            round(raw_per_s * REFERENCE_VALIDITY, 3),
        "weights": weights_label,
        "stages": m,
        "device_s_per_request": round(dev_s_per_req, 4),
        "host_device_overlap_ratio": overlap,
        "requests": len(refs),
        "samples_per_request": batch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="screen",
                    choices=["screen", "fixed", "e2e"])
    ap.add_argument("--e2e-requests", type=int, default=6,
                    help="e2e measurement: number of reference requests")
    ap.add_argument("--e2e-refs", default="protocol",
                    choices=["protocol", "demo"],
                    help="e2e workload: synthetic 15-39 heavy-atom protocol "
                         "references (comparable to the screen figure) or "
                         "the reference demo conformers")
    ap.add_argument("--no-e2e", action="store_true",
                    help="skip the e2e figures appended to the screen "
                         "workload output")
    ap.add_argument("--batch", type=int, default=128,
                    help="samples per request")
    ap.add_argument("--requests", type=int, default=25,
                    help="screen workload: number of reference requests")
    ap.add_argument("--variance", type=int, default=2,
                    help="screen workload: size spread around each reference")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--nodes", type=int, default=42,
                    help="fixed workload: padded node count")
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed repeats; min() is reported (2 suffice — a "
                         "third buys noise floor, not information, and round "
                         "3 showed wall-clock is the scarce resource)")
    ap.add_argument("--bucket", type=int, default=8,
                    help="screen workload: node-axis bucket size (smaller = "
                         "less N^2 padding waste, more compiled programs)")
    ap.add_argument("--refine-bucket", type=int, default=1,
                    help="screen workload: after the coarse-bucket figure "
                         "AND the e2e figures are in hand, re-measure at "
                         "this finer bucket if the time budget allows and "
                         "report the better number (0 to disable)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="MXU compute precision for the denoiser MLPs")
    ap.add_argument("--pallas", default=None, choices=["on", "off", "auto"],
                    help="override EGNNConfig.use_pallas")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of one timed repeat")
    ap.add_argument("--time-budget", type=float, default=870.0,
                    help="seconds: later phases are skipped when the "
                         "remaining budget no longer covers them")
    ap.add_argument("--cache-dir", default="/root/repo/.jax_cache",
                    help="persistent compilation cache directory ('' to "
                         "disable) — repeat runs skip the multi-minute "
                         "remote compiles when the backend supports "
                         "executable serialization")
    args = ap.parse_args()
    _start_watchdog()

    platform, probe_log = acquire_backend(args.time_budget)
    if platform is None:
        # Still ONE parseable JSON line: a failed artifact must say it was
        # environmental (BENCH_r04.json was a bare backend-init stack trace).
        print(json.dumps({
            "metric": "edm_samples_per_s", "value": None, "unit": "samples/s",
            "vs_baseline": None, "error": "backend_unavailable",
            "probe_log": probe_log,
            "budget_s": args.time_budget,
        }))
        return

    if args.cache_dir:
        # Harmless if the PJRT plugin cannot serialize executables (cache
        # writes are then skipped).
        from ml_conformer_generator_tpu.utils.cache import enable_compile_cache
        enable_compile_cache(args.cache_dir)

    import os

    def build_e2e(source: str, gen=None, driver=None):
        from ml_conformer_generator_tpu.generator import MLConformerGenerator
        from ml_conformer_generator_tpu.parallel.screening import \
            ScreeningDriver

        if gen is None:
            # Use the repo's own trained weights when a prior training run
            # left them on disk (scripts/train_overfit_validity.py) — the
            # e2e validity figure then measures real chemistry instead of
            # the validity-0 random-init floor.
            kw = {}
            edm_w = "/root/repo/.weights_overfit/edm_overfit.npz"
            adj_w = "/root/repo/.weights_overfit/adj_mat_seer_overfit.npz"
            if os.path.exists(edm_w) and os.path.exists(adj_w):
                kw.update(edm_weights=edm_w, adj_mat_seer_weights=adj_w)
                gen_label = ("own-trained overfit weights (.weights_overfit;"
                             " see VALIDITY.json caveats)")
            else:
                gen_label = "untrained (random init; no trained weights found)"
            gen = MLConformerGenerator(diffusion_steps=args.steps,
                                       compute_dtype=args.dtype,
                                       node_bucket=args.bucket, **kw)
            gen.bench_weights_label = gen_label
            driver = ScreeningDriver(gen)
        if source == "protocol":
            refs = make_protocol_refs(args.e2e_requests)
        else:
            refs = make_demo_refs(args.e2e_requests, gen.min_n_nodes,
                                  gen.max_n_nodes)
        return gen, driver, refs

    if args.workload == "e2e":
        note(f"e2e workload start ({args.e2e_refs} references)")
        gen, driver, refs = build_e2e(args.e2e_refs)
        e2e = measure_e2e(gen, driver, refs, args.batch, args.variance,
                          weights_label=gen.bench_weights_label)
        res = {
            "metric": "e2e_valid_mol_per_s",
            "value": e2e["valid_mol_per_s"],
            "unit": "valid mol/s (full generate_conformers pipeline; "
                    f"{gen.bench_weights_label})",
            "vs_baseline": round(
                e2e["valid_mol_per_s"] / REFERENCE_VALID_MOL_PER_S, 3),
            "e2e": e2e,
        }
        if len(probe_log) > 1:
            res["backend_probe_log"] = probe_log
        print(json.dumps(res))
        return

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

    dev = jax.devices()[0]  # acquire_backend already verified this works
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

    import numpy as np

    from ml_conformer_generator_tpu.utils.masks import pad_to_bucket

    B = args.batch
    # jit caches one executable per input-shape bucket automatically.
    gen = jax.jit(lambda p, k, nm, em, ctx: sampler.generate(
        p, k, gamma, nm, em, ctx))
    adj_fwd = jax.jit(lambda p, e, d, a: adj_mat_seer_forward(p, e, d, a,
                                                              adj_cfg))

    # Representative padded bond-predictor inputs (content-independent cost).
    D = adj_cfg.dimension
    elements = jnp.zeros((B, D), dtype=jnp.int32)
    dist = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, D, D)))
    adj = (dist < 1.0).astype(jnp.float32)

    # Build the request list: (node_mask, edge_mask, context) per request.
    ref_ctx = jnp.asarray([105.0, 473.0, 537.0])
    if args.workload == "fixed":
        inp = prepare_edm_input(
            jax.random.PRNGKey(2), B, ref_ctx, CONTEXT_NORMS,
            min_n_nodes=25, max_n_nodes=min(39, args.nodes - 1),
            n_nodes_pad=args.nodes)
        requests = [inp[:3]]
        shape_desc = f"N={args.nodes}"
    else:
        shape_desc = (f"{args.requests} refs 15-39 ±{args.variance}, "
                      f"buckets of {args.bucket}")

    def build_screen_requests(bucket: int):
        # Reference evaluation protocol: requests around references of
        # 15-39 heavy atoms, sizes in [n_ref - v, n_ref + v], each request
        # padded to its own (bucketed) max size. Seed 0 matches
        # make_protocol_refs, so the e2e phase sees the same distribution.
        host_rng = np.random.default_rng(0)
        n_refs = host_rng.integers(15, 40, size=args.requests)
        reqs = []
        for i, n_ref in enumerate(sorted(int(n) for n in n_refs)):
            mn = max(15, n_ref - args.variance)
            mx = min(39, n_ref + args.variance)
            inp = prepare_edm_input(
                jax.random.PRNGKey(1000 + i), B, ref_ctx, CONTEXT_NORMS,
                min_n_nodes=mn, max_n_nodes=mx,
                n_nodes_pad=pad_to_bucket(mx, bucket))
            reqs.append(inp[:3])
        return reqs

    if args.workload == "screen":
        requests = build_screen_requests(args.bucket)

    def remaining() -> float:
        return args.time_budget - (time.perf_counter() - T0)

    def compile_all(reqs, deadline_s=None) -> bool:
        """Warmup/compile one call per distinct shape. A cold compile through
        this machine's remote-compile tunnel can take minutes per bucket
        (seconds when the persistent cache hits). Returns False if
        `deadline_s` (seconds since bench start) passed before all shapes
        compiled."""
        seen = set()
        for nm, em, ctx in reqs:
            if nm.shape in seen:
                continue
            seen.add(nm.shape)
            t0 = time.perf_counter()
            jax.block_until_ready(gen(params, jax.random.PRNGKey(10),
                                      nm, em, ctx))
            note(f"compiled bucket N={nm.shape[1]} "
                 f"({time.perf_counter() - t0:.1f}s)")
            if (deadline_s is not None
                    and time.perf_counter() - T0 > deadline_s):
                return False
        return True

    def measure(reqs, profile: bool = False) -> float:
        times = []
        for i in range(args.repeats):
            if profile and i == 1:
                jax.profiler.start_trace(args.profile)
            t0 = time.perf_counter()
            outs = []
            for r, (nm, em, ctx) in enumerate(reqs):
                outs.append(gen(params, jax.random.PRNGKey(100 + 31 * i + r),
                                nm, em, ctx))
                outs.append(adj_fwd(adj_params, elements, dist, adj))
            jax.block_until_ready(outs)
            times.append(time.perf_counter() - t0)
            note(f"repeat {i}: {len(reqs)} requests in {times[-1]:.1f}s "
                 f"({B * len(reqs) / times[-1]:.1f} samples/s)")
            if profile and i == 1:
                jax.profiler.stop_trace()
        return B * len(reqs) / min(times)

    # -- Phase 1: coarse-bucket screen measurement (the guaranteed headline)
    compile_all(requests)
    jax.block_until_ready(adj_fwd(adj_params, elements, dist, adj))
    note("phase 1 (screen measure) start")
    samples_per_s = measure(requests, profile=bool(args.profile))
    note(f"phase 1 done: {samples_per_s:.1f} samples/s")
    out = {
        "metric": "edm_samples_per_s",
        "value": round(samples_per_s, 3),
        "unit": f"samples/s (batch {B}, {args.steps} steps, {shape_desc}, "
                f"{dev.platform})",
        "vs_baseline": round(samples_per_s / REFERENCE_RAW_SAMPLES_PER_S, 3),
    }
    if len(probe_log) > 1:
        out["backend_probe_log"] = probe_log

    # -- Phases 2+3: e2e BEFORE exact-size refinement, so the end-to-end
    # figures can never be starved by refinement compiles (round-3 failure
    # mode: BENCH_r03.json ended with e2e skipped on budget).
    e2e_gen = e2e_driver = None
    if args.workload == "screen" and not args.no_e2e:
        if remaining() < 0.25 * args.time_budget:
            out["e2e"] = {"skipped": f"time budget ({remaining():.0f}s "
                                     "remaining)"}
        else:
            note("phase 2 (e2e, protocol references) start")
            e2e_gen, e2e_driver, refs = build_e2e("protocol")
            out["e2e"] = measure_e2e(
                e2e_gen, e2e_driver, refs, args.batch, args.variance,
                deadline=0.85 * args.time_budget,
                weights_label=e2e_gen.bench_weights_label)
            note("phase 2 done")
        if remaining() > 0.40 * args.time_budget and e2e_gen is not None:
            note("phase 3 (e2e, demo-pool references) start")
            _, _, refs = build_e2e("demo", e2e_gen, e2e_driver)
            out["e2e_demo_pool"] = measure_e2e(
                e2e_gen, e2e_driver, refs, args.batch, args.variance,
                deadline=0.85 * args.time_budget,
                weights_label=e2e_gen.bench_weights_label)
            note("phase 3 done")
        if e2e_gen is not None:
            # free the e2e pipeline's params + per-bucket executables before
            # refinement compiles up to ~23 more exact-size programs (the
            # phase-1 sampler state must stay — phase 4 reuses it)
            import gc
            del e2e_gen, e2e_driver
            gc.collect()

    # -- Phase 4: padding refinement. The bucketed node axis wastes O(N^2)
    # edge work on padded rows (PERF.md); exact-size programs are ~17%
    # faster at the screen protocol but need one compile per distinct
    # request size, so they are only economical when the persistent cache is
    # warm (seconds per program vs minutes cold — the deadline aborts the
    # attempt, keeping the coarse figure and the e2e figures already in
    # hand).
    if (args.workload == "screen" and args.refine_bucket
            and args.refine_bucket < args.bucket
            and remaining() > 0.30 * args.time_budget):
        note("phase 4 (exact-size refinement) start")
        fine = build_screen_requests(args.refine_bucket)
        if compile_all(fine, deadline_s=0.80 * args.time_budget):
            fine_per_s = measure(fine)
            note(f"phase 4 done: {fine_per_s:.1f} samples/s at "
                 f"bucket {args.refine_bucket}")
            out["padding"] = {
                f"bucket_{args.bucket}": round(samples_per_s, 3),
                f"bucket_{args.refine_bucket}": round(fine_per_s, 3),
            }
            if fine_per_s > samples_per_s:
                out["value"] = round(fine_per_s, 3)
                out["unit"] = (f"samples/s (batch {B}, {args.steps} steps, "
                               f"{args.requests} refs 15-39 "
                               f"±{args.variance}, exact sizes "
                               f"(bucket {args.refine_bucket}), "
                               f"{dev.platform})")
                out["vs_baseline"] = round(
                    out["value"] / REFERENCE_RAW_SAMPLES_PER_S, 3)
        else:
            note("phase 4 aborted: compile deadline")
            out["padding"] = {"refine": "aborted (compile deadline)"}
    elif args.workload == "screen" and args.refine_bucket \
            and args.refine_bucket < args.bucket:
        out["padding"] = {"refine": f"skipped ({remaining():.0f}s remaining)"}
    note("printing result")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
