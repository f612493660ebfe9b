#!/bin/bash
# Round-4 part D: finish the hardware chain — stage 4 resumed from the r4a
# stage-3 artifacts with the compile-payload fix, then a confirmation bench.
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

run chain_s4 5400 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    CHAIN_S4_ITERS=500 \
    python scripts/tpu_supervise.py --stall-sec 1500 -- \
    python -u scripts/tpu_chain_stage4.py

run bench_confirm 2400 python bench.py

echo "=== QUEUE R4D DONE $(date -u)"
