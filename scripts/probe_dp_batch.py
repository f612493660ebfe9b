"""Data-parallel scaling evidence for Stage 1 (VERDICT r2 #3).

Real multi-chip hardware is not reachable from this box, so the dp story
is assembled from three measurable pieces:

1. REAL-CHIP batch scaling (this probe): step time vs rays/step on the
   single v5e. Under dp, each chip runs batch/n_dev rays + one gradient
   all-reduce; if measured step time is ~linear in batch above the shipped
   1024, then splitting the batch across chips returns the time of the
   smaller batch (plus the collective).
2. ANALYTIC collective cost (printed): ring all-reduce of the grad pytree
   (dominated by the 2^19 x 16-level hash grids) over v5e ICI at
   ~45 GB/s/link x 2 directions: t = 2 * bytes/n * (n-1)/n / bw.
3. Virtual-mesh numerical equivalence: tests/test_multichip.py already
   pins dp==single-device gradients bitwise-close; __graft_entry__'s
   dryrun executes the sharded step.

Run on an idle chip: PYTHONPATH=/root/.axon_site:/root/repo
python scripts/probe_dp_batch.py
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses the bench's flagship step builder)
from holoscene_tpu.losses.holoscene_loss import LossConfig  # noqa: E402
from holoscene_tpu.models.holoscene import init_holoscene  # noqa: E402
from holoscene_tpu.training.stage1 import (  # noqa: E402
    make_optimizer,
    make_train_step,
)

cfg = bench.flagship_config()
lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0, reg_vio_weight=0.01)
key = jax.random.PRNGKey(0)
key, k_init = jax.random.split(key)
params = init_holoscene(k_init, cfg)
optimizer = make_optimizer(5e-4, 20.0, 200000)
opt_state = optimizer.init(params)
step = make_train_step(cfg, lcfg, optimizer)

grad_bytes = sum(np.prod(x.shape) * 4 for x in jax.tree.leaves(params))
print(f"param/grad pytree: {grad_bytes/1e6:.1f} MB", flush=True)
for n_dev in (4, 8, 16):
    bw = 45e9 * 2  # v5e ICI per link, both directions of the ring
    t = 2 * grad_bytes * (n_dev - 1) / n_dev / bw
    print(f"  analytic ring all-reduce @ {n_dev} chips: {t*1e3:.2f} ms",
          flush=True)

rows = []
# the train step DONATES params/opt_state; evolve one live copy across
# batch sizes instead of re-entering from the (deleted) originals
p, o = params, opt_state
# each batch size is a fresh ~10-min AOT compile through the relay; the
# two load-bearing rows are the shipped 1024 (dp per-chip batch, cache-hot
# after bench.py) and 4096 (the 4-chip total batch) — PROBE_DP_SIZES
# restores the full sweep on a long window
for n_rays in tuple(int(s) for s in os.environ.get(
        "PROBE_DP_SIZES", "1024,4096").split(",") if s.strip()):
    key, kb = jax.random.split(key)
    batch = bench.make_batch(kb, n_rays)
    for i in range(3):  # compile + settle
        key, k = jax.random.split(key)
        p, o, m = step(p, o, k, batch, i, call_reg=True, with_bg=False)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(12):
        key, k = jax.random.split(key)
        p, o, m = step(p, o, k, batch, i, call_reg=True, with_bg=False)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 12
    rows.append((n_rays, dt))
    print(f"rays/step {n_rays:5d}: {dt*1e3:7.1f} ms/step "
          f"({n_rays/dt:8.0f} rays/s)", flush=True)

base = next((t for r, t in rows if r == 1024), None)
if base is None:  # custom PROBE_DP_SIZES without the shipped 1024 row
    r0, base = min(rows)
    print(f"\n(no 1024-ray row measured; projecting from the smallest "
          f"measured batch, {r0} rays)", flush=True)
print("\ndp projection from batch scaling (shipped 1024 rays/chip):",
      flush=True)
for n_dev in (4, 8):
    total = 1024 * n_dev
    t_row = next((t for r, t in rows if r == total), None)
    if t_row is None:
        continue
    coll = 2 * grad_bytes * (n_dev - 1) / n_dev / (45e9 * 2)
    eff = t_row / n_dev / (base + coll)
    print(f"  {n_dev} chips x 1024 rays: single-chip time for the full "
          f"{total}-ray batch {t_row*1e3:.1f} ms vs dp step "
          f"{(base+coll)*1e3:.1f} ms -> speedup {t_row/(base+coll):.2f}x "
          f"(efficiency {eff:.0%})", flush=True)
