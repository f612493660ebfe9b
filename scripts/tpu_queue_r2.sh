#!/bin/bash
# Round-2 TPU measurement queue — run ONE instance when the relay returns:
#   nohup bash scripts/tpu_queue_r2.sh > /tmp/tpu_queue_r2.log 2>&1 &
# Ordering: cheap bench A/Bs first (each is one TPU job, serial), then
# profiles, then the 2500-iter tiered train gate, then the long annealed
# flagship (interruptible; supervisor+ckpt makes restarts cheap), then its
# posthoc chamfer. PERF.md rules: ONE TPU job at a time; end-to-end bench
# deltas only. Worst-case wall is bounded by the per-job timeouts (~9.5h);
# keep the chip free for the driver's end-of-round bench.
set -u
cd /root/repo
# Preserve the axon plugin registration path (/root/.axon_site): with
# JAX_PLATFORMS=axon set in the box env, dropping it from PYTHONPATH makes
# every jax init fail with "Backend 'axon' is not in the list of known
# backends".
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <tag> <timeout-sec> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*"
  timeout "$to" "$@" 2>&1 | tail -40
  # rc of the COMMAND, not the tail stage (timeout kills report 124 here)
  echo "=== [$tag] rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
}

# 0. relay sanity (fail fast if still down)
run probe 300 python /tmp/tpu_probe.py || true

# 1. bench baseline re-confirm (fresh compile cache after the box reboot;
#    also re-measures stage4 splats/s with the per-tile n_live walk bound).
#    This run also warms the cache for the driver's end-of-round bench.
run bench_base 3600 python bench.py

# 2. tiered fine levels A/B (the uncommitted-lever delta): candidate
#    shipping point fine_f=32 with the all-dense tail (levels=6), plus the
#    8-level tail for attribution
run bench_fine32_lv6 3600 env BENCH_FINE_TOP_F=32 BENCH_FINE_LEVELS=6 python bench.py
run bench_fine32 3600 env BENCH_FINE_TOP_F=32 python bench.py

# 3. batch-size rescaling: round-1 scaling was flat (gather/scatter-element
#    bound); the sampled backward cut scatter elements ~8x, so re-measure
run bench_rays4096 3600 env BENCH_RAYS=4096 python bench.py

# 3b. sampler upsample rounds: offline placement probe says 4 rounds ==
#     converged placement (PERF.md); safe -20% sampler cost if bench agrees
run bench_siter4 3600 env BENCH_SAMPLER_ITERS=4 python bench.py

# 4. post-sampling phase attribution (guides the next lever)
run phases6 2400 python scripts/profile_phases6.py

# 5. 2500-iter train gate for the tiered default candidate (fine_f=32 of 56,
#    all-dense tail)
run gate_fine32 10800 env QUALITY_TOP_M=56 QUALITY_GRAD_MODE=fused \
    QUALITY_DUAL=1 QUALITY_COLOR_BWD=1 QUALITY_SDF_BWD=1 \
    QUALITY_FINE_TOP_F=32 QUALITY_FINE_LEVELS=6 \
    python scripts/tpu_supervise.py --stall-sec 1500 -- \
    python scripts/tpu_quality_run.py

# 6. annealed flagship 512² (sampled bwd until 7k, exact after).
# Timeout bounded at 3.5h so a wedged run cannot hold the chip into the
# driver's own end-of-round bench (expected wall ~90 min at 2300/1734
# rays/s mixed; supervisor restarts are checkpointed).
run flagship_anneal 12600 env FLAGSHIP_WORK=/tmp/tpu_flagship512_anneal \
    FLAGSHIP_RES=512 FLAGSHIP_ITERS=10000 FLAGSHIP_EXACT_FROM=7000 \
    FLAGSHIP_GRAD_MODE=fused FLAGSHIP_TOP_M=64 \
    python scripts/tpu_supervise.py --stall-sec 1500 -- \
    python scripts/tpu_flagship_run.py

# 7. posthoc chamfer + eval PSNR of the annealed flagship
run posthoc 3600 python scripts/flagship_posthoc_eval.py \
    --work /tmp/tpu_flagship512_anneal

echo "=== QUEUE DONE $(date -u)"
