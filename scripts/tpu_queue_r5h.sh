#!/bin/bash
# Round-5 part H: lane-friendly probe_sdf_fn re-measure + cadence sweep.
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

run sampler_parts3 3600 python -u scripts/probe_sampler_parts.py

run bench_pg128v2_e64 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=128 BENCH_PROBE_EVERY=64 python bench.py
run bench_pg128v2_e128 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=128 BENCH_PROBE_EVERY=128 python bench.py
run bench_pg96v2_e64 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=96 BENCH_PROBE_EVERY=64 python bench.py

echo "=== QUEUE R5H DONE $(date -u)"
