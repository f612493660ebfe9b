#!/bin/bash
# Round-3 part C (after tpu_queue_r3b.sh): v3 flat-splat attribution + A/B,
# the fixed dp batch-scaling probe, the stage-2..4 hardware chain retry
# (view-mesh decimation + vectorized components + flushed phase prints),
# and the final confirmation bench.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -60
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run flat_v3 3600 python -u scripts/probe_flat_v3.py

run dp_batch 2400 python -u scripts/probe_dp_batch.py

run chain234 14400 env FLAGSHIP_WORK=/tmp/tpu_flagship_r3 FLAGSHIP_RES=512 \
    python scripts/tpu_supervise.py --stall-sec 3600 -- \
    python -u scripts/tpu_chain_run.py

run bench_final 2400 python bench.py

echo "=== QUEUE R3C DONE $(date -u)"
