#!/bin/bash
# Round-5 TPU measurement session, v2 (supersedes run_tpu_session_r5.sh).
# Changes from v1: 16k-step EDM training (the width-64 CPU rehearsal showed
# valid-fragment size scales with steps: 1200 steps -> max 10 atoms,
# 5000 -> 17 atoms + first size-matched molecule), unlimited-ish probe cap
# (the r4 outage lasted 4 h), and a 1-chip edges/s re-baseline at the end.
set -u
LOG=/root/repo/.scratch/tpu_r5
mkdir -p "$LOG"

stamp() { echo "[runbook2 $(date +%H:%M:%S)] $*" | tee -a "$LOG/runbook.log"; }

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
print('probe ok', jax.devices()[0].platform)" >> "$LOG/probe.log" 2>&1
}

waitup() {
  local n=0
  until probe; do
    n=$((n + 1))
    stamp "probe failed (attempt $n); resting 240s"
    sleep 240
    if [ "$n" -ge 200 ]; then stamp "giving up after $n probes"; exit 1; fi
  done
  stamp "tunnel up"
}

run_step() {  # run_step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  waitup
  stamp "step $name start: $*"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  stamp "step $name done rc=$?"
}

stamp "session v2 start"

run_step bench 960 python bench.py
run_step train 5400 python scripts/train_overfit_validity.py \
    --edm-steps 16000 --bond-steps 800 --samples 64 --augment 16
run_step eval 2400 python scripts/make_eval_report.py \
    --references 25 --samples 100
run_step mb512 900 python scripts/kernel_microbench.py --batch 512
run_step mb1024 900 python scripts/kernel_microbench.py --batch 1024
run_step sched 2400 python scripts/schedule_experiments.py --loops 20
run_step sched_rbg 900 python scripts/schedule_experiments.py \
    --configs baseline --rng rbg --loops 20
run_step bench_prof 960 python bench.py --profile "$LOG/trace" \
    --no-e2e --requests 8 --refine-bucket 0
run_step trace_cpu 600 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/trace_breakdown.py "$LOG/trace"
run_step edges 900 python scripts/edges_scaling.py

stamp "session v2 complete"
