#!/bin/bash
# Round-5 part D: proxy-path sampler attribution + CHW stage-4 re-measure.
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

run sampler_parts2 3600 python -u scripts/probe_sampler_parts.py

run bench_s4_chw 2400 env BENCH_SKIP_STAGE1=1 python bench.py

run bench_pg128_e32 2400 env BENCH_SKIP_STAGE4=1 BENCH_DP_PROJECTION=0 BENCH_PROBE_GRID=128 BENCH_PROBE_EVERY=32 python bench.py

echo "=== QUEUE R5D DONE $(date -u)"
