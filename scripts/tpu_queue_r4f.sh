#!/bin/bash
# Round-4 part F: trainer-cadence probe retry + transposed-payload bench A/B.
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

run s4_trainer3 3600 python -u scripts/probe_stage4_trainer.py

run bench_payt 2400 env HOLOSCENE_FLAT_PAYT=1 BENCH_SKIP_STAGE1=1 python bench.py

echo "=== QUEUE R4F DONE $(date -u)"
