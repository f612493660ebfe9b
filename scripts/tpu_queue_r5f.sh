#!/bin/bash
# Round-5 part F: flagship 512^2/10k validation of the BAKED PROBE GRID
# (VERDICT r4 #2's done-bar needs a flagship-scale gate row for any
# sampler-placement change), then posthoc geometry eval and the final
# full bench. The occupancy duty-cycle mitigation gets its own MID-SCALE
# gate in r5i — the single flagship slot goes to the throughput-relevant
# knob.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOCK=/tmp/holoscene_chip.lock

run() {
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  flock "$LOCK" env HOLOSCENE_CHIP_LOCK_HELD=1 timeout "$to" "$@" 2>&1 | tail -60
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

rm -rf /tmp/tpu_flagship_pg5
run flagship_probe 10800 env FLAGSHIP_WORK=/tmp/tpu_flagship_pg5 \
    FLAGSHIP_RES=512 FLAGSHIP_ITERS=10000 FLAGSHIP_CKPT_FREQ=500 \
    FLAGSHIP_PROBE_GRID=128 FLAGSHIP_PROBE_EVERY=64 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run posthoc_probe 3600 python scripts/flagship_posthoc_eval.py \
    --work /tmp/tpu_flagship_pg5

run bench_final 3600 python bench.py

echo "=== QUEUE R5F DONE $(date -u)"
