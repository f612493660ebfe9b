#!/bin/bash
# Round-3 part B (after tpu_queue_r3.sh): dp batch-scaling evidence, the
# flat rebin-cadence A/B, and the 3-round sampler quality gate.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -50
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run dp_batch 2400 python scripts/probe_dp_batch.py

run bench_rebin1 2400 env BENCH_SKIP_STAGE4=0 BENCH_REBIN_EVERY=1 \
    python bench.py
run bench_rebin32 2400 env BENCH_REBIN_EVERY=32 python bench.py

run s1_attrib 2400 python scripts/profile_stage1.py

run gate_sampler3 5400 env QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 QUALITY_SAMPLER_ITERS=3 \
    python scripts/tpu_supervise.py --stall-sec 900 -- \
    python scripts/tpu_quality_run.py

echo "=== QUEUE R3B DONE $(date -u)"
