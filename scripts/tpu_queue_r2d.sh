#!/bin/bash
# Round-2 session-D TPU queue (post-reboot rerun of session-C's lost jobs):
# (1) 2500-iter quality gate at the combined shipping candidate knobs
#     (tiered fine levels fine_f=32/levels=6; the gate conf already runs the
#     4-round sampler) — the decision-maker for flipping bench defaults;
# (2) splat-walk A/B probes (scan-cumprod + packed fetch variants);
# (3) final bench at whatever defaults ship, warming the compile cache the
#     driver's end-of-round bench will hit.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -40
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run gate_fine32 3600 env QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 900 -- \
    python scripts/tpu_quality_run.py

run splat_cumprod 1200 python scripts/probe_splat_cumprod.py
run splat_fetch 1200 python scripts/probe_splat_fetch.py

echo "=== QUEUE D DONE $(date -u)"
