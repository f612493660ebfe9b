#!/bin/bash
# Round-5 part G: stage-4 backward-side attribution (+ CHW probe row).
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

run flat_parts_r5 3600 python -u scripts/probe_flat_fwd_parts.py

echo "=== QUEUE R5G DONE $(date -u)"
