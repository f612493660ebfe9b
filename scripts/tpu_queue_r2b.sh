#!/bin/bash
# Round-2 TPU queue, part B — run AFTER tpu_queue_r2.sh finishes:
#   nohup bash scripts/tpu_queue_r2b.sh > /tmp/tpu_queue_r2b.log 2>&1 &
# Combined-knob shipping candidate: tiered fine levels + 4 sampler rounds.
# Quality evidence: the 2500-iter gate (tpu_quality_run.py) already trains
# at 4 sampler rounds, so part A's gate_fine32 covers this combination; the
# 5->4 placement convergence is probed offline on the trained flagship
# checkpoint (PERF.md "Sampler upsample rounds").
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -40
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

# combined bench A/B: tiered default candidate + 4 sampler rounds
run bench_combo 3600 env BENCH_FINE_TOP_F=32 BENCH_FINE_LEVELS=6 \
    BENCH_SAMPLER_ITERS=4 python bench.py

# stage-4 attribution: candidate gather/scatter vs walk, K sweep
run splat_attrib 3600 python scripts/probe_splat_attrib.py

# stage-4 walk formulation A/B (+ validates Mosaic lowers pltpu.roll)
run splat_cumprod 3600 python scripts/probe_splat_cumprod.py

# stage-4 candidate-fetch A/B (one width-16 row gather vs five gathers)
run splat_fetch 3600 python scripts/probe_splat_fetch.py

# re-attribute the full-step backward on current code (the 60ms "other")
run bwd_split 3600 python scripts/profile_backward_split.py

echo "=== QUEUE B DONE $(date -u)"
