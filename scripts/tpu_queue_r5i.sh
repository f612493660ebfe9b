#!/bin/bash
# Round-5 part I: MID-SCALE occupancy gate (VERDICT r4 #5): 5k iters at
# 256^2 with the duty-cycle mitigation ON and full-interval eval frames —
# the gate class that would have caught the r4 flagship collapse (the
# 2500-iter/128^2 gate passed a config the 512^2/10k run then failed).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -60
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run gate_occ_mid 9000 env QUALITY_WORK=/tmp/tpu_quality_occ_mid \
    QUALITY_RES=256 QUALITY_ITERS=5000 \
    QUALITY_OCC=1 QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

# paired baseline at the same scale (occ off) for the parity read
run gate_mid_base 9000 env QUALITY_WORK=/tmp/tpu_quality_mid_base \
    QUALITY_RES=256 QUALITY_ITERS=5000 \
    QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

echo "=== QUEUE R5I DONE $(date -u)"
