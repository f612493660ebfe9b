#!/bin/bash
# Round-4 part E: flagship 512^2 validation of the occupancy-restricted
# sampler (launch only after gate_occ passes) — real-scale rays/s where
# beta is annealed + quality vs the r3 anneal row (36.91 dB).
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

run chain_s4b 5400 env FLAGSHIP_WORK=/tmp/tpu_chain_mini FLAGSHIP_RES=256 \
    CHAIN_S4_ITERS=500 \
    python scripts/tpu_supervise.py --stall-sec 1500 -- \
    python -u scripts/tpu_chain_stage4.py

run fwd_parts2 2400 python -u scripts/probe_flat_fwd_parts.py

run s4_trainer2 3600 python -u scripts/probe_stage4_trainer.py

# sampler cost is 38% of the step (occ_phases r4c); eval-sample-count A/Bs
run bench_es96 2400 env BENCH_EVAL_SAMPLES=96 BENCH_SKIP_STAGE4=1 python bench.py
run bench_es64 2400 env BENCH_EVAL_SAMPLES=64 BENCH_SKIP_STAGE4=1 python bench.py

run flagship_occ 10800 env FLAGSHIP_WORK=/tmp/tpu_flagship_occ \
    FLAGSHIP_RES=512 FLAGSHIP_ITERS=10000 FLAGSHIP_CKPT_FREQ=500 \
    FLAGSHIP_OCC=1 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

echo "=== QUEUE R4E DONE $(date -u)"
