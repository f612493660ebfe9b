#!/bin/bash
# Round-4 part A: the on-hardware stages 1->2->3->4 chain FIRST (VERDICT r3
# #2 — scripted twice in r3, executed zero times), at the reduced 256^2
# scale that proves end-to-end execution and records per-stage wall-clock.
# Every job holds the chip lock (VERDICT r3 #7) so a driver-fired bench
# can never overlap and record garbage.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -80
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run s1_mini 4500 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    FLAGSHIP_ITERS=1200 FLAGSHIP_CKPT_FREQ=200 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run chain_mini 9000 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    CHAIN_S2_ITERS=100 CHAIN_S3_ITERS=300 CHAIN_S4_ITERS=500 \
    CHAIN_MESH_RES=128 CHAIN_VIEW_RES=128 \
    python scripts/tpu_supervise.py --stall-sec 1800 -- \
    python -u scripts/tpu_chain_run.py

echo "=== QUEUE R4A DONE $(date -u)"
