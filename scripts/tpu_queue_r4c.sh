#!/bin/bash
# Round-4 part C: stage-4 kernel A/Bs after the MXU-power rewrite, fwd
# phase attribution, and the TRAINER-cadence probe (VERDICT r3 #1c).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -80
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run flat_r4_mxu 3600 python -u scripts/probe_flat_r4.py

run fwd_parts 2400 python -u scripts/probe_flat_fwd_parts.py

run s4_trainer 3600 python -u scripts/probe_stage4_trainer.py

run occ_phases 3600 python -u scripts/probe_occ_phases.py

echo "=== QUEUE R4C DONE $(date -u)"
