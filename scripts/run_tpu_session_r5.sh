#!/bin/bash
# Round-5 TPU measurement session: every chip-bound item from VERDICT.md,
# run sequentially (ONE python at a time — the axon tunnel wedges under
# concurrent clients), each step preceded by a small-matmul probe so a
# mid-session wedge parks the script in a probe loop instead of burning a
# step's timeout, and every output landing in $LOG for later inspection.
#
# Order (VERDICT priority): bench artifact validation + cache warm ->
# training for size-matched validity -> protocol EVAL report -> Pallas
# mega-batch crossover -> XLA schedule sweep -> profile + trace breakdown.
set -u
LOG=/root/repo/.scratch/tpu_r5
mkdir -p "$LOG"

stamp() { echo "[runbook $(date +%H:%M:%S)] $*" | tee -a "$LOG/runbook.log"; }

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
print('probe ok', jax.devices()[0].platform)" >> "$LOG/probe.log" 2>&1
}

waitup() {  # block until the tunnel answers a real dispatch
  local n=0
  until probe; do
    n=$((n + 1))
    stamp "probe failed (attempt $n); resting 240s"
    sleep 240
    if [ "$n" -ge 60 ]; then stamp "giving up after $n probes"; exit 1; fi
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

stamp "session start"

run_step bench 960 python bench.py
run_step train 4500 python scripts/train_overfit_validity.py \
    --edm-steps 6000 --bond-steps 800 --samples 64 --augment 16
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

stamp "session complete"
