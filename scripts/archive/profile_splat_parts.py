"""Part-wise Stage-4 splat render attribution on the real TPU.

Times: projection-only, selection K sweep, full fwd, full train step —
scan-amortized (carry-perturbed so XLA cannot hoist), single readback.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from holoscene_tpu.ops.splat import (  # noqa: E402
    covariance_3d,
    project_gaussians,
    render_gaussians,
)

N, RES, K = 100_000, 512, 512
rng = np.random.default_rng(0)
means = jnp.asarray(rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.005, 0.02, (N, 3)).astype(np.float32))
opac = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32))
viewmat = jnp.eye(4).at[2, 3].set(2.0)
intr = jnp.array(
    [[RES * 0.9, 0, RES / 2], [0, RES * 0.9, RES / 2], [0, 0, 1.0]]
)
tgt = jnp.asarray(rng.uniform(0, 1, (RES, RES, 3)).astype(np.float32))


def timed(name, fn):
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

        def t(g, iters=4):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(means))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:44s} {dt*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


timed("projection only", lambda m: jnp.sum(project_gaussians(
    m, covariance_3d(quats, scales), viewmat, intr, RES, RES)[1]))

for kk in (64, 256, 512):
    timed(f"full fwd K={kk}", lambda m, kk=kk: jnp.sum(render_gaussians(
        m, quats, scales, opac, colors, viewmat, intr, width=RES, height=RES,
        tile_size=16, max_per_tile=kk)["rgb"]))


def train_loss(m):
    out = render_gaussians(
        m, quats, scales, opac, colors, viewmat, intr,
        width=RES, height=RES, tile_size=16, max_per_tile=K,
    )
    return jnp.mean((out["rgb"] - tgt) ** 2)


timed("train fwd+grad K=512", lambda m: jnp.sum(jax.grad(train_loss)(m)))

# --- surface-like scene (stage-4 regime): opaque surfels tiling a wall;
# tiles saturate after the first depth layer, exercising early exit ---
side = int(np.sqrt(N))
gx, gy = np.meshgrid(np.linspace(-0.9, 0.9, side), np.linspace(-0.9, 0.9, side))
means_s = jnp.asarray(np.stack(
    [gx.ravel(), gy.ravel(), np.zeros(side * side)], -1).astype(np.float32))
ns = means_s.shape[0]
scales_s = jnp.full((ns, 3), 2.0 / side, jnp.float32)
opac_s = jnp.full((ns,), 0.9, jnp.float32)
colors_s = jnp.asarray(rng.uniform(0, 1, (ns, 3)).astype(np.float32))
quats_s = jnp.asarray(np.tile([1.0, 0, 0, 0], (ns, 1)).astype(np.float32))
tgt_s = tgt


def timed_s(name, fn):
    def runner(kk):
        @jax.jit
        def go(m):
            def body(acc, _):
                return acc + fn(m + acc * 1e-20), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=kk)
            return acc
        return go
    lo, hi = runner(1), runner(9)
    _ = float(lo(means_s)); _ = float(hi(means_s))

    def t(g, iters=4):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(g(means_s))
        return (time.perf_counter() - t0) / iters

    dt = (t(hi) - t(lo)) / 8.0
    print(f"{name:44s} {dt*1e3:8.1f} ms", flush=True)


timed_s("SURFACE full fwd K=512", lambda m: jnp.sum(render_gaussians(
    m, quats_s, scales_s, opac_s, colors_s, viewmat, intr, width=RES,
    height=RES, tile_size=16, max_per_tile=K)["rgb"]))


def train_loss_s(m):
    out = render_gaussians(
        m, quats_s, scales_s, opac_s, colors_s, viewmat, intr,
        width=RES, height=RES, tile_size=16, max_per_tile=K,
    )
    return jnp.mean((out["rgb"] - tgt_s) ** 2)


timed_s("SURFACE train fwd+grad K=512",
        lambda m: jnp.sum(jax.grad(train_loss_s)(m)))
