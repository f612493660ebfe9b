#!/bin/bash
# Round-2 session-C TPU queue: waits for the already-running baseline bench,
# then (1) measures the combined shipping candidate (tiered fine levels +
# 4 sampler rounds) — this also warms the compile cache the driver's
# end-of-round bench will hit once the defaults flip — and (2) runs the
# 2500-iter quality gate at exactly those knobs. Splat probes last (cheap,
# informative, never gate shipping).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -40
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

# wait for the in-flight baseline bench to release the chip
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 10; done
fi
echo "=== baseline bench done: $(tail -2 /tmp/bench_base.log | head -1)"

run bench_combo 2400 env BENCH_FINE_TOP_F=32 BENCH_FINE_LEVELS=6 \
    BENCH_SAMPLER_ITERS=4 python bench.py

run gate_fine32 5400 env QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 900 -- \
    python scripts/tpu_quality_run.py

run splat_cumprod 1200 python scripts/probe_splat_cumprod.py
run splat_fetch 1200 python scripts/probe_splat_fetch.py

echo "=== QUEUE C DONE $(date -u)"
