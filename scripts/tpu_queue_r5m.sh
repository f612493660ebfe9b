#!/bin/bash
# Round-5 master tail queue (ordered): flagship probe-grid validation ->
# posthoc geometry -> mid-scale occ gates -> stage-4 projection bench ->
# flat attribution -> final full bench.
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

run bench_s4_proj 2400 env BENCH_SKIP_STAGE1=1 python bench.py

rm -rf /tmp/tpu_flagship_pg5
run flagship_probe 10800 env FLAGSHIP_WORK=/tmp/tpu_flagship_pg5 \
    FLAGSHIP_RES=512 FLAGSHIP_ITERS=10000 FLAGSHIP_CKPT_FREQ=500 \
    FLAGSHIP_PROBE_GRID=128 FLAGSHIP_PROBE_EVERY=64 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_flagship_run.py

run posthoc_probe 3600 python scripts/flagship_posthoc_eval.py \
    --work /tmp/tpu_flagship_pg5

run gate_occ_mid 7200 env QUALITY_WORK=/tmp/tpu_quality_occ_mid \
    QUALITY_RES=256 QUALITY_ITERS=5000 \
    QUALITY_OCC=1 QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

run gate_mid_base 7200 env QUALITY_WORK=/tmp/tpu_quality_mid_base \
    QUALITY_RES=256 QUALITY_ITERS=5000 \
    QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1200 -- \
    python -u scripts/tpu_quality_run.py

run flat_parts_proj 3600 python -u scripts/probe_flat_fwd_parts.py

run bench_final 3600 python bench.py

echo "=== QUEUE R5M DONE $(date -u)"
