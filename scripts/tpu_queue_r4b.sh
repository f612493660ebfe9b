#!/bin/bash
# Round-4 part B (runs after the r4a chain; serialized by the chip lock):
#   1. stage-4 flat probe — saturation trim + lane-major cumsum A/B
#   2. full bench (new defaults: trimmed stage-4, dp projection)
#   3. stage-1 occupancy bench A/B
#   4. 2500-iter occupancy quality gate at the shipped knob stack
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -80
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run flat_r4 3600 python -u scripts/probe_flat_r4.py

run bench_new 2400 python bench.py

run bench_occ 2400 env BENCH_OCC=1 BENCH_SKIP_STAGE4=1 python bench.py

run gate_occ 5400 env QUALITY_OCC=1 QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

echo "=== QUEUE R4B DONE $(date -u)"
