#!/bin/bash
# Round-3 TPU queue (VERDICT r2 #2 + #6 + #3):
#   1. gate_anneal  — 512^2/10k-iter flagship run at the FULL shipped
#      defaults (sampled_all + tiered fine32/6 + 4-round sampler) with the
#      exact-backward anneal on for the last 2000 iters. Decides whether the
#      anneal recovers the 1.06 dB sampled-backward loss (>= 36.25 dB) or
#      the confs flip to exact-tail defaults.
#   2. gate_eval    — post-hoc chamfer for the gate row.
#   3. chain234     — stages 2->3->4 on the gate checkpoint at flagship
#      scale; wall-clock + PSNR/SSIM recorded in chain_timeline.json.
#   4. s1_dense256  — bench A/B for the dmr=256 dense-level expansion.
#   5. bench_final  — shipped-defaults bench (warms the driver's cache).
# ONE job at a time; host otherwise idle (PERF.md measurement rules).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export FLAGSHIP_WORK=/tmp/tpu_flagship_r3

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -60
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

run gate_anneal 14400 env FLAGSHIP_RES=512 FLAGSHIP_ITERS=10000 \
    FLAGSHIP_EXACT_FROM=8000 FLAGSHIP_CKPT_FREQ=500 \
    python scripts/tpu_supervise.py --stall-sec 1500 -- \
    python scripts/tpu_flagship_run.py

run gate_eval 2400 python scripts/flagship_posthoc_eval.py \
    --work "$FLAGSHIP_WORK" --res 512

run chain234 12600 env FLAGSHIP_RES=512 \
    python scripts/tpu_supervise.py --stall-sec 2400 -- \
    python scripts/tpu_chain_run.py

run s1_dense256 3600 env BENCH_DENSE_MAX_RES=256 python bench.py

run bench_final 3600 python bench.py

echo "=== QUEUE R3 DONE $(date -u)"
