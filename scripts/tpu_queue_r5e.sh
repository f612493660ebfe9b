#!/bin/bash
# Round-5 part E: FRESH 256^2 chain (VERDICT r4 #4) — stage 1 trained from
# scratch with all round-5 fixes in (stage-4 apply_updates + real trim
# telemetry + CHW), texture-seeded stage 4 with a longer budget, per-stage
# quality columns in the timeline, committed as CHAIN_r05.json.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -100
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

W=/tmp/tpu_chain_r5
rm -rf "$W"   # FRESH: no resumed state from earlier rounds

run s1_chain 7200 env FLAGSHIP_WORK=$W FLAGSHIP_RES=256 \
    FLAGSHIP_ITERS=2500 FLAGSHIP_CKPT_FREQ=250 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run chain_r5 14400 env FLAGSHIP_WORK=$W FLAGSHIP_RES=256 \
    CHAIN_S2_ITERS=100 CHAIN_S3_ITERS=400 CHAIN_S4_ITERS=2500 \
    CHAIN_MESH_RES=128 CHAIN_VIEW_RES=128 \
    CHAIN_OUT=/root/repo/CHAIN_r05.json \
    python scripts/tpu_supervise.py --stall-sec 1800 -- \
    python -u scripts/tpu_chain_run.py

echo "=== QUEUE R5E DONE $(date -u)"
