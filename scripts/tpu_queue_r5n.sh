#!/bin/bash
# Round-5 part N (fresh box): the two deliverables the r5e/r5m queues left
# unrecorded — (1) the stage-4 bench row with the fused scalar-channel EWA
# projection, (2) the fresh 256^2 chain -> committed CHAIN_r05.json (the
# previous fresh chain's re-run on repaired artifacts died with /tmp).
# Stage-1 runs with the flagship-validated probe grid (128^3, cadence 64).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock
touch "$LOCK"

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -80
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run bench_s4_proj 2400 env BENCH_SKIP_STAGE1=1 python bench.py

W=/tmp/tpu_chain_r5
rm -rf "$W"   # FRESH: no resumed state from earlier rounds

run s1_chain 5400 env FLAGSHIP_WORK=$W FLAGSHIP_RES=256 \
    FLAGSHIP_ITERS=2500 FLAGSHIP_CKPT_FREQ=250 \
    FLAGSHIP_PROBE_GRID=128 FLAGSHIP_PROBE_EVERY=64 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run chain_r5 12600 env FLAGSHIP_WORK=$W FLAGSHIP_RES=256 \
    CHAIN_S2_ITERS=100 CHAIN_S3_ITERS=400 CHAIN_S4_ITERS=2500 \
    CHAIN_MESH_RES=128 CHAIN_VIEW_RES=128 \
    CHAIN_OUT=/root/repo/CHAIN_r05.json \
    python scripts/tpu_supervise.py --stall-sec 1800 -- \
    python -u scripts/tpu_chain_run.py

run bench_final 3600 python bench.py

echo "=== QUEUE R5N DONE $(date -u)"
