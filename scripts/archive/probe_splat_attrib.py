"""Stage-4 step attribution on the BENCH scene: candidate gather/scatter
vs compositing walk, at K in {256, 512, 1024}.

Hypothesis (PERF.md round 2): with the n_live-bounded walk, the step cost
that still scales in K is the [T, K] candidate gather (fwd) and its
transpose scatter (bwd) — the same element-throughput wall as Stage 1.
This probe decides whether the packed-payload row gather and/or a
two-group tile partition ship.

Serial, idle chip. Forced host readbacks (relay no-op block_until_ready).
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

import os
N = int(os.environ.get("ATTRIB_N", "100000"))
RES = int(os.environ.get("ATTRIB_RES", "512"))

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


def timed(fn, *args, steps=10):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(steps):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps


from functools import partial


@partial(jax.jit, static_argnames=("k", "with_gather"))
def select_and_gather(m, s, o, c, k: int, with_gather: bool):
    """Selection (overlap + approx_max_k) and optionally the candidate
    gathers, WITHOUT the walk — returns a reduce so nothing is dead."""
    from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians

    tile_size = 16
    tiles = RES // tile_size
    n_tiles = tiles * tiles
    cov3d = covariance_3d(quats, s)
    xy, depth, conic, radius, valid = project_gaussians(
        m, cov3d, viewmat, intr, RES, RES)
    t_idx = jnp.arange(n_tiles)
    tx0 = (t_idx % tiles) * tile_size
    ty0 = (t_idx // tiles) * tile_size
    depth_masked = jnp.where(valid, depth, jnp.inf)
    tc = 64

    def sel(carry, ci):
        x0 = jax.lax.dynamic_slice_in_dim(tx0, ci * tc, tc)
        y0 = jax.lax.dynamic_slice_in_dim(ty0, ci * tc, tc)
        gx, gy, r = xy[None, :, 0], xy[None, :, 1], radius[None, :]
        ov = ((gx + r >= x0[:, None]) & (gx - r <= x0[:, None] + tile_size)
              & (gy + r >= y0[:, None]) & (gy - r <= y0[:, None] + tile_size))
        nd = jnp.where(ov, -depth_masked[None, :], -jnp.inf)
        tv, ti = jax.lax.approx_max_k(nd, k)
        return carry, (tv, ti)

    _, (tvs, tis) = jax.lax.scan(sel, None, jnp.arange(n_tiles // tc))
    top_idx = tis.reshape(-1, k)
    if not with_gather:
        return jnp.sum(jnp.isfinite(tvs)) + jnp.sum(top_idx)
    g_xy = xy[top_idx]
    g_conic = conic[top_idx]
    g_rgb = c[top_idx]
    g_op = o[top_idx]
    g_z = depth[top_idx]
    return (jnp.sum(g_xy) + jnp.sum(g_conic) + jnp.sum(g_rgb)
            + jnp.sum(g_op) + jnp.sum(g_z))


for k in [int(x) for x in os.environ.get("ATTRIB_KS", "256,512,1024").split(",")]:
    t_sel = timed(lambda m, kk=k: select_and_gather(
        m, scales, opac, colors, kk, False), means)
    t_selg = timed(lambda m, kk=k: select_and_gather(
        m, scales, opac, colors, kk, True), means)
    # candidate scatter alone: grad of the gather-sum w.r.t. the globals
    grad_g = jax.jit(jax.grad(
        lambda m, o, c, kk=k: select_and_gather(m, scales, o, c, kk, True),
        argnums=(0, 1, 2)))
    t_scat = timed(grad_g, means, opac, colors)

    fwd = jax.jit(lambda m, kk=k: render_gaussians(
        m, quats, scales, opac, colors, viewmat, intr, width=RES,
        height=RES, max_per_tile=kk)["rgb"].sum())

    def loss(m, o, c, kk=k):
        r = render_gaussians(m, quats, scales, o, c, viewmat, intr,
                             width=RES, height=RES, max_per_tile=kk)["rgb"]
        return jnp.mean((r - tgt) ** 2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_fwd = timed(fwd, means)
    t_step = timed(step, means, opac, colors)
    print(f"K={k}: select {t_sel*1e3:.1f} | +gather {t_selg*1e3:.1f} | "
          f"gather+scatter(bwd) {t_scat*1e3:.1f} | full fwd {t_fwd*1e3:.1f} "
          f"| full fwd+bwd {t_step*1e3:.1f} ms", flush=True)
