"""Phase attribution for the flat splat pipeline on the bench scene:
binning / payload pack / fwd walk / bwd walk / gather-transpose scatter,
plus a tile_size=8 variant (less wasted pixel-lane work per candidate).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians  # noqa: E402
from holoscene_tpu.ops.splat import render_gaussians  # noqa: E402
from holoscene_tpu.ops import splat_flat as sf  # noqa: E402

N, RES = 100_000, 512
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


def timed(name, make_fn, iters=3):
    try:
        def runner(kk):
            @jax.jit
            def go(m):
                def body(acc, _):
                    return acc + make_fn(m + acc * 1e-20), None
                acc, _ = jax.lax.scan(body, 0.0, None, length=kk)
                return acc
            return go

        lo, hi = runner(1), runner(9)
        _ = float(lo(means)); _ = float(hi(means))

        def t(g):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(means))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return float("nan")


for TS in (16, 8):
    tiles = RES // TS
    t0 = time.time()
    plan = sf.plan_flat(xy, conic, opac, valid, tiles, tiles, TS)
    print(f"\n== TS={TS}: {plan} chunks={plan.c_max//sf.CHUNK} "
          f"(plan {time.time()-t0:.0f}s)", flush=True)

    def proj(m):
        c3 = covariance_3d(quats, scales)
        return project_gaussians(m, c3, viewmat, intr, RES, RES)

    def binning(m):
        pxy, pz, pc, _, pv = proj(m)
        meta = sf.build_flat_candidates(pxy, pz, pc, opac, pv,
                                        tiles_x=tiles, tiles_y=tiles,
                                        tile_size=TS, plan=plan)
        return jnp.sum(meta["gidx"] % 7) * 1e-9

    def packed(m):
        pxy, pz, pc, _, pv = proj(m)
        meta = sf.build_flat_candidates(pxy, pz, pc, opac, pv,
                                        tiles_x=tiles, tiles_y=tiles,
                                        tile_size=TS, plan=plan)
        n = pxy.shape[0]
        payload = jnp.concatenate(
            [pxy, pc, opac[:, None], colors, pz[:, None],
             jnp.ones((n, 1), pxy.dtype)], axis=-1)
        payload = jnp.concatenate(
            [payload, jnp.zeros((1, 11), payload.dtype)], axis=0)
        cand_rows = jnp.take(payload, meta["gidx"], axis=0)
        n_chunks = plan.c_max // sf.CHUNK
        cand = jnp.swapaxes(cand_rows.reshape(n_chunks, sf.CHUNK, 11), 1, 2)
        return jnp.sum(cand[:, 0, :]) * 1e-9

    def fwd(m):
        return jnp.sum(render_gaussians(
            m, quats, scales, opac, colors, viewmat, intr, width=RES,
            height=RES, tile_size=TS, flat_plan=plan)["rgb"])

    def train(m):
        def loss(mm):
            out = render_gaussians(
                mm, quats, scales, opac, colors, viewmat, intr, width=RES,
                height=RES, tile_size=TS, flat_plan=plan)
            return jnp.mean((out["rgb"] - tgt) ** 2)
        return jnp.sum(jax.grad(loss)(m))

    timed(f"TS{TS} proj only", lambda m: jnp.sum(proj(m)[0]) * 1e-9)
    timed(f"TS{TS} proj+binning", binning)
    timed(f"TS{TS} proj+binning+pack", packed)
    timed(f"TS{TS} full fwd", fwd)
    timed(f"TS{TS} full fwd+bwd", train)
