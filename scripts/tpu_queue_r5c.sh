#!/bin/bash
# Round-5 part C: baked probe-grid A/B (stage-1 sampler lever) + quality gate.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -40
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

B="BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0"

run bench_base 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 python bench.py
run bench_pg128_e16 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=128 BENCH_PROBE_EVERY=16 python bench.py
run bench_pg128_e64 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=128 BENCH_PROBE_EVERY=64 python bench.py
run bench_pg96_e32 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=96 BENCH_PROBE_EVERY=32 python bench.py

# 2500-iter quality gate with the probe grid on (shipped fast path)
run gate_probe 5400 env QUALITY_PROBE_GRID=128 QUALITY_PROBE_EVERY=16 \
    QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

echo "=== QUEUE R5C DONE $(date -u)"
