#!/usr/bin/env python
"""Aggregate a jax.profiler Chrome trace into a per-op time breakdown.

Input: a directory written by ``jax.profiler.start_trace`` (e.g.
``bench.py --profile DIR``). Finds the newest ``*.trace.json.gz``, keeps the
device lanes (XLA ops), and prints total time by op name and by category —
the evidence base for PERF.md's roofline attribution (round-3 verdict:
"trace-driven attack on the 7 ms schedule gap").

Usage: python scripts/trace_breakdown.py DIR [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if any(k in n for k in ("dot", "conv", "matmul", "gemm")):
        return "matmul (MXU)"
    if any(k in n for k in ("copy", "transpose", "bitcast", "reshape")):
        return "copy/layout"
    if any(k in n for k in ("all-reduce", "all-gather", "collective",
                            "reduce-scatter")):
        return "collective"
    if any(k in n for k in ("rng", "random")):
        return "rng"
    if any(k in n for k in ("dynamic-update", "dynamic-slice", "scatter",
                            "gather")):
        return "slice/scatter"
    if "infeed" in n or "outfeed" in n:
        return "host transfer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--lane", default=None,
                    help="substring filter on the process/thread lane name "
                         "(default: auto-pick TPU/XLA lanes)")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    path = files[-1]
    print(f"# {path}")
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # lane naming: process_name / thread_name metadata events
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def lane_ok(e):
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        lane = f"{pname}/{tname}"
        if args.lane:
            return args.lane.lower() in lane.lower()
        return ("tpu" in pname.lower() and "xla op" in tname.lower()) or \
               ("tensorcore" in lane.lower())

    by_op = collections.Counter()
    by_cat = collections.Counter()
    t0, t1 = float("inf"), 0.0
    n = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or not lane_ok(e):
            continue
        # strip op-instance suffixes (fusion.123 -> fusion)
        name = re.sub(r"\.\d+$", "", e.get("name", "?"))
        by_op[name] += e["dur"]
        by_cat[categorize(name)] += e["dur"]
        t0 = min(t0, e["ts"])
        t1 = max(t1, e["ts"] + e["dur"])
        n += 1
    if n == 0:
        lanes = sorted({f"{pid_names.get(p, p)}/{tid_names.get((p, t), t)}"
                        for p, t in {(e.get('pid'), e.get('tid'))
                                     for e in events if e.get('ph') == 'X'}})
        print("no device events matched; available lanes:")
        for ln in lanes[:40]:
            print("  ", ln)
        return

    busy = sum(by_op.values())
    window = t1 - t0
    print(f"# {n} device events; busy {busy / 1e3:.2f} ms over "
          f"{window / 1e3:.2f} ms window "
          f"({100 * busy / max(window, 1):.0f}% occupancy)\n")
    print("## by category")
    for cat, dur in by_cat.most_common():
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / busy:5.1f}%  {cat}")
    print("\n## top ops")
    for name, dur in by_op.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / busy:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
