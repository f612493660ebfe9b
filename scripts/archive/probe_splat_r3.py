"""Round-3 Stage-4 attribution on the BENCH scene (floor + spheres — the
scene whose calibration picks K=1024).

Phases timed (scan-amortized, carry-perturbed, readback-forced — PERF.md
pitfalls): projection, selection (overlap + approx_max_k), selection+fetch
(packed row gather), full fwd, fwd+bwd, at K=512 and K=1024. Also prints
per-tile live-count statistics and the count reduction from an exact
ellipse-vs-tile max-alpha bound (the circle-radius test massively
over-counts for anisotropic screen footprints, e.g. a floor at grazing
angle).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians  # noqa: E402
from holoscene_tpu.ops.splat import render_gaussians, tile_overlap_counts  # noqa: E402

N, RES = 100_000, 512
TS = 16
rng = np.random.default_rng(0)
n_floor = N * 6 // 10
floor = np.stack(
    [rng.uniform(-1, 1, n_floor), np.full(n_floor, 0.5),
     rng.uniform(-1, 1, n_floor)], axis=-1,
)
n_sph = N - n_floor
u = rng.normal(size=(n_sph, 3))
u /= np.linalg.norm(u, axis=-1, keepdims=True)
centers = np.where(
    (np.arange(n_sph) % 2 == 0)[:, None],
    np.array([[-0.4, 0.2, 0.0]]), np.array([[0.45, 0.3, 0.2]]),
)
sph = centers + u * 0.28
means = jnp.asarray(np.concatenate([floor, sph]).astype(np.float32))
spacing = float(np.sqrt(8.0 / N))
scales = jnp.asarray(
    (rng.uniform(0.8, 1.6, (N, 3)) * spacing).astype(np.float32))
opac = jax.nn.sigmoid(jnp.asarray(rng.normal(1.5, 0.5, N).astype(np.float32)))
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32))
viewmat = jnp.eye(4).at[2, 3].set(2.0)
intr = jnp.array(
    [[RES * 0.9, 0, RES / 2], [0, RES * 0.9, RES / 2], [0, 0, 1.0]]
)
tgt = jnp.asarray(rng.uniform(0, 1, (RES, RES, 3)).astype(np.float32))

# ---- live-count statistics (circle-rect test, as shipped) ----
counts = np.asarray(tile_overlap_counts(means, quats, scales, viewmat, intr,
                                        RES, RES))
print(f"circle-rect counts: sum={counts.sum()} mean={counts.mean():.0f} "
      f"p50={np.percentile(counts,50):.0f} p90={np.percentile(counts,90):.0f} "
      f"p99={np.percentile(counts,99):.0f} max={counts.max()}", flush=True)

# ---- exact max-alpha bound per (tile, gaussian): keep iff the max of
# op*exp(-0.5 q) over the tile rect is >= 1/255, where q = d^T conic d ----
cov3d = covariance_3d(quats, scales)
xy, depth, conic, radius, valid = project_gaussians(
    means, cov3d, viewmat, intr, RES, RES)
tiles_x = RES // TS


@jax.jit
def bound_counts():
    t_idx = jnp.arange(tiles_x * tiles_x)
    x0 = (t_idx % tiles_x) * TS
    y0 = (t_idx // tiles_x) * TS
    # clamp gaussian center to the tile rect -> nearest point
    thr = 2.0 * jnp.log(jnp.maximum(opac, 1e-6) * 255.0)  # q <= thr to keep

    def per_chunk(carry, c):
        xx0 = jax.lax.dynamic_slice_in_dim(x0, c * 64, 64).astype(jnp.float32)
        yy0 = jax.lax.dynamic_slice_in_dim(y0, c * 64, 64).astype(jnp.float32)
        cx = jnp.clip(xy[None, :, 0], xx0[:, None], xx0[:, None] + TS)
        cy = jnp.clip(xy[None, :, 1], yy0[:, None], yy0[:, None] + TS)
        dx = cx - xy[None, :, 0]
        dy = cy - xy[None, :, 1]
        # q at the CLAMPED point is a lower bound on min-over-rect only for
        # axis-aligned conics; for correlated conics it can under/over-shoot
        # by up to the cross term — still a useful screening statistic here.
        q = (conic[None, :, 0] * dx * dx + 2 * conic[None, :, 1] * dx * dy
             + conic[None, :, 2] * dy * dy)
        keep = valid[None, :] & (q <= thr[None, :])
        return carry, keep.sum(axis=1)

    _, ks = jax.lax.scan(per_chunk, None, jnp.arange(tiles_x * tiles_x // 64))
    return ks.reshape(-1)


bc = np.asarray(bound_counts())
print(f"alpha-bound counts: sum={bc.sum()} mean={bc.mean():.0f} "
      f"p50={np.percentile(bc,50):.0f} p90={np.percentile(bc,90):.0f} "
      f"p99={np.percentile(bc,99):.0f} max={bc.max()}", flush=True)


def timed(name, fn, iters=4):
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
        print(f"{name:44s} {dt*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def sel_only(m, k):
    """Selection phase only: overlap + approx_max_k (no fetch/walk)."""
    cov = covariance_3d(quats, scales)
    pxy, pd, pc, pr, pv = project_gaussians(m, cov, viewmat, intr, RES, RES)
    n_tiles = tiles_x * tiles_x
    t_idx = jnp.arange(n_tiles)
    tx0 = (t_idx % tiles_x) * TS
    ty0 = (t_idx // tiles_x) * TS
    dmb = jnp.where(pv, pd, jnp.inf)

    def chunk(carry, c):
        x0 = jax.lax.dynamic_slice_in_dim(tx0, c * 64, 64)
        y0 = jax.lax.dynamic_slice_in_dim(ty0, c * 64, 64)
        gx, gy, r = pxy[None, :, 0], pxy[None, :, 1], pr[None, :]
        ov = ((gx + r >= x0[:, None]) & (gx - r <= x0[:, None] + TS)
              & (gy + r >= y0[:, None]) & (gy - r <= y0[:, None] + TS))
        nd = jnp.where(ov, -dmb[None, :], -jnp.inf)
        tv, ti = jax.lax.approx_max_k(nd, k)
        return carry, (tv.sum(), ti.sum())

    _, (s1, s2) = jax.lax.scan(chunk, None, jnp.arange(n_tiles // 64))
    return jnp.sum(jnp.where(jnp.isfinite(s1), s1, 0.0)) + s2.sum() * 1e-12


def sel_fetch(m, k):
    """Selection + packed fetch (no walk)."""
    cov = covariance_3d(quats, scales)
    pxy, pd, pc, pr, pv = project_gaussians(m, cov, viewmat, intr, RES, RES)
    n_tiles = tiles_x * tiles_x
    t_idx = jnp.arange(n_tiles)
    tx0 = (t_idx % tiles_x) * TS
    ty0 = (t_idx // tiles_x) * TS
    dmb = jnp.where(pv, pd, jnp.inf)

    def chunk(carry, c):
        x0 = jax.lax.dynamic_slice_in_dim(tx0, c * 64, 64)
        y0 = jax.lax.dynamic_slice_in_dim(ty0, c * 64, 64)
        gx, gy, r = pxy[None, :, 0], pxy[None, :, 1], pr[None, :]
        ov = ((gx + r >= x0[:, None]) & (gx - r <= x0[:, None] + TS)
              & (gy + r >= y0[:, None]) & (gy - r <= y0[:, None] + TS))
        nd = jnp.where(ov, -dmb[None, :], -jnp.inf)
        tv, ti = jax.lax.approx_max_k(nd, k)
        return carry, ti
    _, tis = jax.lax.scan(chunk, None, jnp.arange(n_tiles // 64))
    ti = tis.reshape(-1, k)
    payload = jnp.concatenate(
        [pxy, pc, colors, opac[:, None], pd[:, None],
         jnp.zeros((N, 6), pxy.dtype)], axis=-1)
    cand = jnp.take(payload, ti.reshape(-1), axis=0).reshape(n_tiles, k, 16)
    return cand.sum()


timed("projection only", lambda m: jnp.sum(project_gaussians(
    m, covariance_3d(quats, scales), viewmat, intr, RES, RES)[1]))
for k in (512, 1024):
    timed(f"selection only K={k}", lambda m, k=k: sel_only(m, k))
    timed(f"selection+fetch K={k}", lambda m, k=k: sel_fetch(m, k))
    timed(f"full fwd K={k}", lambda m, k=k: jnp.sum(render_gaussians(
        m, quats, scales, opac, colors, viewmat, intr, width=RES, height=RES,
        tile_size=16, max_per_tile=k)["rgb"]), iters=3)

    def train_loss(m, k=k):
        out = render_gaussians(
            m, quats, scales, opac, colors, viewmat, intr,
            width=RES, height=RES, tile_size=16, max_per_tile=k,
        )
        return jnp.mean((out["rgb"] - tgt) ** 2)

    timed(f"train fwd+grad K={k}", lambda m, k=k: jnp.sum(
        jax.grad(train_loss)(m)), iters=3)
