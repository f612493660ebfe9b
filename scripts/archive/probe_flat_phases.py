"""Fine-grained flat-splat phase attribution at TS=16 on the bench scene:
expansion / sort / compaction / payload pack / walk fwd / walk bwd /
gather-transpose scatter — plus the steady-state cost of a step with a
FROZEN binning plan (amortized-binning design: indices refresh every k
steps, values re-gathered every step)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians  # noqa: E402
from holoscene_tpu.ops import splat_flat as sf  # noqa: E402

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

tiles = RES // TS
n_tiles = tiles * tiles
cov3d = covariance_3d(quats, scales)
xy, depth, conic, radius, valid = project_gaussians(
    means, cov3d, viewmat, intr, RES, RES)
plan = sf.plan_flat(xy, conic, opac, valid, tiles, tiles, TS)
n_chunks = plan.c_max // sf.CHUNK
print(f"plan {plan} chunks={n_chunks}", flush=True)

# frozen binning plan (host-side once)
meta0 = jax.jit(
    lambda *a: sf.build_flat_candidates(
        *a, tiles_x=tiles, tiles_y=tiles, tile_size=TS, plan=plan)
)(xy, depth, conic, opac, valid)
meta0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), meta0)


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
        print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return float("nan")


def proj(m):
    c3 = covariance_3d(quats, scales)
    return project_gaussians(m, c3, viewmat, intr, RES, RES)


# ---- binning internals (indices only; sort is the suspect) ----

def expand_keys(m):
    """Reproduce build_flat_candidates' expansion up to (key, gidx)."""
    pxy, pz, pc, _, pv = proj(m)
    n = pxy.shape[0]
    ts = float(TS)
    sx, sy = plan.span_x, plan.span_y
    wx, wy, thr = sf._alpha_extents(pc, opac)
    v = pv & (opac >= sf.ALPHA_EPS)
    dq = jnp.clip(pz * 100, 0, 2000).astype(jnp.int32)  # stand-in quant
    tx_lo = jnp.clip(jnp.floor((pxy[:, 0] - wx) / ts), 0, tiles - 1
                     ).astype(jnp.int32)
    ty_lo = jnp.clip(jnp.floor((pxy[:, 1] - wy) / ts), 0, tiles - 1
                     ).astype(jnp.int32)
    off = jnp.arange(sx * sy, dtype=jnp.int32)
    tx = tx_lo[:, None] + (off % sx)[None, :]
    ty = ty_lo[:, None] + (off // sx)[None, :]
    keep = v[:, None] & (tx < tiles) & (ty < tiles)
    key = jnp.where(keep, ((ty * tiles + tx) << 11) | dq[:, None],
                    jnp.int32(n_tiles << 11)).reshape(-1)
    gidx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, sx * sy)).reshape(-1)
    return key, gidx


timed("expansion+cull (keys only)",
      lambda m: jnp.sum(expand_keys(m)[0] % 17) * 1e-9)


def sorted_keys(m):
    key, gidx = expand_keys(m)
    skey, sgidx = jax.lax.sort((key, gidx), num_keys=1)
    return jnp.sum(sgidx % 17) * 1e-9


timed("expansion + SORT (key,val)", sorted_keys)


def sort_only_1op(m):
    key, _ = expand_keys(m)
    return jnp.sum(jax.lax.sort(key) % 17) * 1e-9


timed("expansion + sort key-only", sort_only_1op)

timed("full build_flat_candidates", lambda m: jnp.sum(
    sf.build_flat_candidates(
        proj(m)[0], proj(m)[1], proj(m)[2], opac, proj(m)[4],
        tiles_x=tiles, tiles_y=tiles, tile_size=TS, plan=plan,
    )["gidx"] % 17) * 1e-9)


# ---- frozen-plan steady-state costs ----

def pack_frozen(m):
    pxy, pz, pc, _, _ = proj(m)
    n = pxy.shape[0]
    payload = jnp.concatenate(
        [pxy, pc, opac[:, None], colors, pz[:, None],
         jnp.ones((n, 1), pxy.dtype)], axis=-1)
    payload = jnp.concatenate(
        [payload, jnp.zeros((1, 11), payload.dtype)], axis=0)
    cand_rows = jnp.take(payload, meta0["gidx"], axis=0)
    cand = jnp.swapaxes(cand_rows.reshape(n_chunks, sf.CHUNK, 11), 1, 2)
    cand = jnp.concatenate(
        [cand, jnp.zeros((n_chunks, sf.CAND_ROWS - 11, sf.CHUNK),
                         cand.dtype)], axis=1)
    return cand


timed("frozen: pack (gather+transpose)",
      lambda m: jnp.sum(pack_frozen(m)[:, 0, :]) * 1e-9)


def walk_fwd_frozen(m):
    cand = pack_frozen(m)
    rgb_t, depth_acc, alpha = sf._flat_core(
        cand, meta0["tile_chunk_start"], meta0["tile_chunk_cnt"],
        meta0["chunk_tile"], meta0["chunk_pos"],
        n_tiles, TS, tiles, RES, RES, False)
    return jnp.sum(rgb_t) * 1e-9


timed("frozen: pack + walk fwd", walk_fwd_frozen)


def step_frozen(m):
    def loss(mm):
        cand = pack_frozen(mm)
        rgb_t, depth_acc, alpha = sf._flat_core(
            cand, meta0["tile_chunk_start"], meta0["tile_chunk_cnt"],
            meta0["chunk_tile"], meta0["chunk_pos"],
            n_tiles, TS, tiles, RES, RES, False)
        return jnp.mean((rgb_t - 0.5) ** 2) + jnp.mean(alpha) * 1e-3
    return jnp.sum(jax.grad(loss)(m))


timed("frozen: FULL STEP fwd+bwd (means grad)", step_frozen)


def step_frozen_noproj(m):
    """Gradient stops at the projected quantities: isolates walk+scatter."""
    pxy, pz, pc, _, _ = proj(m)

    def loss(pxy_, pc_):
        n = pxy_.shape[0]
        payload = jnp.concatenate(
            [pxy_, pc_, opac[:, None], colors, pz[:, None],
             jnp.ones((n, 1), pxy_.dtype)], axis=-1)
        payload = jnp.concatenate(
            [payload, jnp.zeros((1, 11), payload.dtype)], axis=0)
        cand_rows = jnp.take(payload, meta0["gidx"], axis=0)
        cand = jnp.swapaxes(cand_rows.reshape(n_chunks, sf.CHUNK, 11), 1, 2)
        cand = jnp.concatenate(
            [cand, jnp.zeros((n_chunks, sf.CAND_ROWS - 11, sf.CHUNK),
                             cand.dtype)], axis=1)
        rgb_t, _, alpha = sf._flat_core(
            cand, meta0["tile_chunk_start"], meta0["tile_chunk_cnt"],
            meta0["chunk_tile"], meta0["chunk_pos"],
            n_tiles, TS, tiles, RES, RES, False)
        return jnp.mean((rgb_t - 0.5) ** 2)

    g = jax.grad(loss)(pxy, pc)
    return jnp.sum(g[0]) * 1e-9


timed("frozen: step w/o projection bwd", step_frozen_noproj)
