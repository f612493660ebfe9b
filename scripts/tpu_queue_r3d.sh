#!/bin/bash
# Round-3 part D: confirmation bench on the flat stage-4 default, the dp
# batch-scaling probe, flat-v3 phase attribution, then a REDUCED-SCALE
# stages 1->2->3->4 chain on hardware (256^2, short iters) — the full
# flagship 512^2 chain (tpu_queue_r3c.sh chain234) needs a ~2 h stage-1
# train first and is queued for a long window; this run proves the chain
# executes end-to-end on the chip and records per-stage wall-clock.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -60
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run bench_final 2400 python bench.py

run dp_batch 2400 python -u scripts/probe_dp_batch.py

run flat_v3 3600 python -u scripts/probe_flat_v3.py

run s1_mini 3600 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    FLAGSHIP_ITERS=1200 FLAGSHIP_CKPT_FREQ=200 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run chain_mini 7200 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    CHAIN_S2_ITERS=100 CHAIN_S3_ITERS=300 CHAIN_S4_ITERS=500 \
    CHAIN_MESH_RES=128 CHAIN_VIEW_RES=128 \
    python scripts/tpu_supervise.py --stall-sec 1800 -- \
    python -u scripts/tpu_chain_run.py

echo "=== QUEUE R3D DONE $(date -u)"
