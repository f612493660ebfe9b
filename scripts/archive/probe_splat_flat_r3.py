"""Flat sorted-candidate splat pipeline vs the shipped top-K path, on the
BENCH scene (floor + spheres) at flagship shapes. Measures fwd and fwd+bwd
for both, checks render parity on-device, and prints the plan."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians  # noqa: E402
from holoscene_tpu.ops.splat import render_gaussians  # noqa: E402
from holoscene_tpu.ops.splat_flat import plan_flat  # noqa: E402

N, RES, TS = 100_000, 512, 16
rng = np.random.default_rng(0)
n_floor = N * 6 // 10
floor = np.stack(
    [rng.uniform(-1, 1, n_floor), np.full(n_floor, 0.5),
     rng.uniform(-1, 1, n_floor)], axis=-1)
n_sph = N - n_floor
u = rng.normal(size=(n_sph, 3))
u /= np.linalg.norm(u, axis=-1, keepdims=True)
centers = np.where(
    (np.arange(n_sph) % 2 == 0)[:, None],
    np.array([[-0.4, 0.2, 0.0]]), np.array([[0.45, 0.3, 0.2]]))
means = jnp.asarray(np.concatenate([floor, centers + u * 0.28]).astype(np.float32))
spacing = float(np.sqrt(8.0 / N))
scales = jnp.asarray((rng.uniform(0.8, 1.6, (N, 3)) * spacing).astype(np.float32))
opac = jax.nn.sigmoid(jnp.asarray(rng.normal(1.5, 0.5, N).astype(np.float32)))
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32))
viewmat = jnp.eye(4).at[2, 3].set(2.0)
intr = jnp.array([[RES * 0.9, 0, RES / 2], [0, RES * 0.9, RES / 2], [0, 0, 1.0]])
tgt = jnp.asarray(rng.uniform(0, 1, (RES, RES, 3)).astype(np.float32))

cov3d = covariance_3d(quats, scales)
xy, depth, conic, radius, valid = project_gaussians(
    means, cov3d, viewmat, intr, RES, RES)
t0 = time.time()
plan = plan_flat(xy, conic, opac, valid, RES // TS, RES // TS, TS)
print(f"plan: {plan} (probe {time.time()-t0:.1f}s) "
      f"chunks={plan.c_max//128}", flush=True)

# ---- on-device parity: flat vs topk K=1024 ----
img_f = np.asarray(render_gaussians(
    means, quats, scales, opac, colors, viewmat, intr, width=RES,
    height=RES, tile_size=TS, flat_plan=plan)["rgb"])
img_k = np.asarray(render_gaussians(
    means, quats, scales, opac, colors, viewmat, intr, width=RES,
    height=RES, tile_size=TS, max_per_tile=1024)["rgb"])
mse = np.mean((img_f - img_k) ** 2)
print(f"flat vs topk1024: PSNR={-10*np.log10(max(mse,1e-20)):.1f} dB "
      f"max={np.abs(img_f-img_k).max():.2e}", flush=True)


def timed(name, fn, iters=3):
    def runner(kk):
        @jax.jit
        def go(m):
            def body(acc, _):
                return acc + fn(m + acc * 1e-20), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=kk)
            return acc
        return go

    try:
        lo, hi = runner(1), runner(9)
        _ = float(lo(means)); _ = float(hi(means))

        def t(g):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(means))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:40s} {dt*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def fwd(m, **kw):
    return jnp.sum(render_gaussians(
        m, quats, scales, opac, colors, viewmat, intr, width=RES,
        height=RES, tile_size=TS, **kw)["rgb"])


def train(m, **kw):
    def loss(mm):
        out = render_gaussians(
            mm, quats, scales, opac, colors, viewmat, intr, width=RES,
            height=RES, tile_size=TS, **kw)
        return jnp.mean((out["rgb"] - tgt) ** 2)
    return jnp.sum(jax.grad(loss)(m))


timed("FLAT fwd", lambda m: fwd(m, flat_plan=plan))
timed("FLAT fwd+bwd", lambda m: train(m, flat_plan=plan))
timed("topk1024 fwd", lambda m: fwd(m, max_per_tile=1024))
timed("topk1024 fwd+bwd", lambda m: train(m, max_per_tile=1024))
