"""TPU A/B of the splat compositing walk's cumprod formulation.

"log" (shipped): within-chunk exclusive cumprod via log1p -> triangular
MXU matmul -> exp (3 transcendental passes per chunk).
"scan": lane-rolled multiplies (log2(C) rounds, zero extra transcendentals).

PERF.md stage-4 attribution argues the walk is VPU/transcendental bound;
this probe decides whether "scan" ships. Also validates that Mosaic lowers
pltpu.roll at these shapes at all. Run serial on an idle chip:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_splat_cumprod.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.splat import render_gaussians

N, RES, K = 100_000, 512, 512

rng = np.random.default_rng(0)
n_floor = N * 6 // 10
floor = np.stack([rng.uniform(-1, 1, n_floor), np.full(n_floor, 0.5),
                  rng.uniform(-1, 1, n_floor)], axis=-1)
n_sph = N - n_floor
u = rng.normal(size=(n_sph, 3))
u /= np.linalg.norm(u, axis=-1, keepdims=True)
centers = np.where((np.arange(n_sph) % 2 == 0)[:, None],
                   np.array([[-0.4, 0.2, 0.0]]), np.array([[0.45, 0.3, 0.2]]))
means = jnp.asarray(np.concatenate([floor, centers + u * 0.28])
                    .astype(np.float32))
spacing = float(np.sqrt(8.0 / N))
scales = jnp.asarray((rng.uniform(0.8, 1.6, (N, 3)) * spacing)
                     .astype(np.float32))
quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32))
opac = jnp.asarray(jax.nn.sigmoid(rng.normal(1.5, 0.5, N)).astype(np.float32))
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
viewmat = jnp.eye(4).at[2, 3].set(2.0)
intr = jnp.array([[RES * 0.9, 0, RES / 2], [0, RES * 0.9, RES / 2],
                  [0, 0, 1.0]])
tgt = jnp.asarray(rng.uniform(0, 1, (RES, RES, 3)).astype(np.float32))


def timed(fn, *args, steps=20):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(steps):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps


for mode in ["log", "scan"]:
    # explicit static arg — env-var routing would silently reuse the first
    # mode's jit trace within one process

    @jax.jit
    def fwd(m, s, o, c, mode=mode):
        return render_gaussians(m, quats, s, o, c, viewmat, intr,
                                width=RES, height=RES, max_per_tile=K,
                                cumprod=mode)["rgb"]

    def loss(m, s, o, c, mode=mode):
        r = render_gaussians(m, quats, s, o, c, viewmat, intr,
                             width=RES, height=RES, max_per_tile=K,
                             cumprod=mode)["rgb"]
        return jnp.mean((r - tgt) ** 2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    try:
        t_f = timed(fwd, means, scales, opac, colors)
        t_s = timed(step, means, scales, opac, colors)
        print(f"{mode}: fwd {t_f*1e3:.1f} ms ({N/t_f/1e6:.2f} M splats/s)  "
              f"fwd+bwd {t_s*1e3:.1f} ms ({N/t_s/1e6:.2f} M splats/s)",
              flush=True)
        if mode == "log":
            ref = np.asarray(fwd(means, scales, opac, colors))
        else:
            cur = np.asarray(fwd(means, scales, opac, colors))
            print(f"scan-vs-log max|diff| {np.abs(cur - ref).max():.2e}")
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)

# chunk-length A/B (PERF.md stage-4 lever d): 256 halves loop trips /
# per-trip overheads at the cost of bigger triangular matmuls
for mode in ["log", "scan"]:
    for ch in [256]:

        @jax.jit
        def fwd(m, s, o, c, mode=mode, ch=ch):
            return render_gaussians(m, quats, s, o, c, viewmat, intr,
                                    width=RES, height=RES, max_per_tile=K,
                                    cumprod=mode, chunk=ch)["rgb"]

        def loss(m, s, o, c, mode=mode, ch=ch):
            r = render_gaussians(m, quats, s, o, c, viewmat, intr,
                                 width=RES, height=RES, max_per_tile=K,
                                 cumprod=mode, chunk=ch)["rgb"]
            return jnp.mean((r - tgt) ** 2)

        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        try:
            t_f = timed(fwd, means, scales, opac, colors)
            t_s = timed(step, means, scales, opac, colors)
            cur = np.asarray(fwd(means, scales, opac, colors))
            print(f"{mode}/chunk{ch}: fwd {t_f*1e3:.1f} ms "
                  f"({N/t_f/1e6:.2f} M splats/s)  fwd+bwd {t_s*1e3:.1f} ms "
                  f"({N/t_s/1e6:.2f} M splats/s)  "
                  f"max|diff| {np.abs(cur - ref).max():.2e}", flush=True)
        except Exception as e:
            print(f"{mode}/chunk{ch}: FAILED {type(e).__name__}: {e}",
                  flush=True)
