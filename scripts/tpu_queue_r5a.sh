#!/bin/bash
# Round-5 part A: stage-4 training-health validation at >=1M gaussians
# (post divergence fix: apply_updates restored + real trim telemetry), then
# a stage4-only bench re-measure to confirm the r4 rate stands.
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

# r4f shapes: 512^2, ~1.15M gaussians (area 2e-5), trainer cadence, trim on
run s4_health 5400 env PROBE_S4_ITERS=400 python -u scripts/probe_stage4_trainer.py

run bench_s4 2400 env BENCH_SKIP_STAGE1=1 python bench.py

echo "=== QUEUE R5A DONE $(date -u)"
