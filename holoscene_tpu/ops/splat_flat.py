"""Flat sorted-candidate gaussian splat pipeline (Pallas TPU, fwd + bwd).

This is the TPU-native analog of gsplat's tile binning (reference:
threedgut_tracer/src/kernels/cuda/gutRenderer.cu tile-range walk;
gsplat's projection->sort->per-tile-range rasterization used by
model/gom.py:1120): instead of the per-tile dense top-K selection of
ops/splat.py (approx_max_k over a [tiles, N] matrix — measured 21 ms of a
47.8 ms step at the flagship shapes, with a [tiles, K] fetch that pays for
dead padding), candidates are expanded per gaussian over their tile span,
culled by an exact anisotropic max-alpha bound, sorted ONCE by a fused
(tile, depth) key (lax.sort: 1.7 ms / 1M keys on v5e — the gather/scatter
engine is the bottleneck on this chip, not sort), and compacted into a
flat 128-aligned segment list. Every phase then costs O(live candidates)
instead of O(tiles x K):

  * no K truncation: the renderer composites EXACTLY the candidates whose
    in-tile max alpha can reach the 1/255 compositing threshold, so the
    `max_per_tile` knob and its saturation calibration disappear;
  * the walk is a SEQUENTIAL Pallas grid over 128-candidate chunks with
    transmittance/accumulator carries in VMEM scratch and the per-tile
    output block revisited across a tile's chunks (flash-attention-style);
    per-tile cost tracks actual overlap;
  * the backward is a single REVERSE pass (the forward stashes each
    pixel's total log-transmittance), emitting per-chunk gradient blocks
    that flow back to gaussian parameters through the transpose of the
    candidate gather.

Static-shape contract: `FlatPlan` (tile span + flat capacity) is probed
from the scene once (`plan_flat`) and becomes part of the jit cache key;
an `overflow` output flags when the scene outgrows the plan so trainers
can re-plan (gsplat's buffer-realloc analog).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128          # candidates per grid step (lane width)
TERM_EPS = 1e-4      # tile saturation threshold (matches ops/splat_pallas)
ALPHA_EPS = 1.0 / 255.0
HIGH = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class FlatPlan:
    """Static shape plan for the flat pipeline (part of the jit cache key)."""

    span_x: int      # max tiles a gaussian may cover along x
    span_y: int
    c_max: int       # flat candidate capacity (multiple of CHUNK)

    def __post_init__(self):
        assert self.c_max % CHUNK == 0, self.c_max
        assert self.span_x >= 1 and self.span_y >= 1


# ---------------------------------------------------------------------------
# candidate expansion + binning (pure JAX, inside the caller's jit)
# ---------------------------------------------------------------------------


def _alpha_extents(conic, opac):
    """Per-axis half-extents of the {alpha >= 1/255} superlevel set.

    The set is the ellipse q(d) <= thr with q = d^T conic d and
    thr = 2 ln(255 * op). Its axis-aligned bounding box half-widths are
    sqrt(thr * cov_xx) / sqrt(thr * cov_yy) with cov = conic^{-1} — tight
    for anisotropic footprints where the circumscribed circle of
    ops/splat.py over-counts tiles badly (e.g. a floor at grazing angle).
    """
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    det = jnp.maximum(a * c - b * b, 1e-12)
    thr = 2.0 * jnp.log(jnp.maximum(opac, 1e-6) * 255.0)
    thr = jnp.maximum(thr, 0.0)
    wx = jnp.sqrt(thr * c / det)
    wy = jnp.sqrt(thr * a / det)
    return wx, wy, thr


def _schur_qmin(conic, dxm, dym):
    """Lower bound on min over a tile rect of q(d) = d^T conic d, where
    dxm/dym are the per-axis distances from the gaussian center to the
    rect (0 when the center's coordinate lies inside the interval):
    minimizing q over one free coordinate gives the Schur complements
    (a - b^2/c) dx^2 and (c - b^2/a) dy^2; their max never exceeds the
    true rect minimum, so culling on it never drops a contributor."""
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    sx = jnp.maximum(a - b * b / jnp.maximum(c, 1e-12), 0.0)
    sy = jnp.maximum(c - b * b / jnp.maximum(a, 1e-12), 0.0)
    return jnp.maximum(sx[:, None] * dxm * dxm, sy[:, None] * dym * dym)


def _propagate(values, positions, c_max, fill=0):
    """Piecewise-constant propagation: out[p] = values[t] for the largest t
    with positions[t] <= p. `values` must be non-decreasing in t (cummax
    carries them forward). positions must be strictly increasing."""
    base = jnp.full((c_max,), fill, values.dtype)
    base = base.at[positions].max(values, mode="drop")
    return jax.lax.cummax(base)


def build_flat_candidates(
    xy, depth, conic, opac, valid,
    tiles_x: int, tiles_y: int, tile_size: int, plan: FlatPlan,
    used_chunks=None, trim_slack: int = 2,
):
    """Expansion -> cull -> fused-key sort -> aligned compaction.

    Returns dict with:
      gidx    [c_max] int32 — gaussian index per flat slot (N = trash/dead)
      chunk_tile / chunk_pos / chunk_last / chunk_skip  [c_max/CHUNK] int32
      trimmed [T] int32 — tiles whose tail was saturation-trimmed
      overflow  [] int32 — 1 if the scene needed more than c_max slots
    Only index computations happen here (no gradient path).

    used_chunks [T] int32 (optional): per-tile chunk counts a PRIOR forward
    walk actually composited before saturating (composite_tiles_flat flags
    'used_chunks'). When given, each tile keeps only its front-most
    (used + trim_slack) chunks of depth-sorted candidates — the walk
    early-terminates there anyway, so the per-step payload gathers stop
    paying for candidates behind the saturation depth. Output is IDENTICAL
    to the untrimmed plan as long as no trimmed tile's walk reaches its
    shortened range while still live; the kernels flag that condition
    (flags['stale'] from composite_tiles_flat) so trainers re-plan exactly
    when drift invalidates the trim. TPU-first: gsplat's per-pixel CUDA
    threads exit early for free, while here every binned candidate costs a
    gather-engine row whether walked or not (PERF.md r3 attribution)."""
    n = xy.shape[0]
    n_tiles = tiles_x * tiles_y
    ts = float(tile_size)
    sx, sy = plan.span_x, plan.span_y
    s_tot = sx * sy
    c_max = plan.c_max

    # depth-quantization bits for the fused i32 sort key
    bits = 0
    while ((n_tiles + 1) << (bits + 1)) <= 2**31 - 1 and bits < 20:
        bits += 1
    assert bits >= 10, f"too many tiles for fused i32 keys: {n_tiles}"
    dq_max = (1 << bits) - 2  # reserve top code for per-tile dummies

    xy = jax.lax.stop_gradient(xy)
    depth_sg = jax.lax.stop_gradient(depth)
    conic = jax.lax.stop_gradient(conic)
    opac = jax.lax.stop_gradient(opac)

    wx, wy, thr = _alpha_extents(conic, opac)
    valid = valid & (opac >= ALPHA_EPS)

    dmin = jnp.min(jnp.where(valid, depth_sg, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth_sg, -jnp.inf))
    dq = jnp.clip(
        (depth_sg - dmin) / jnp.maximum(dmax - dmin, 1e-9) * dq_max,
        0, dq_max,
    ).astype(jnp.int32)

    tx_lo = jnp.clip(jnp.floor((xy[:, 0] - wx) / ts), 0, tiles_x - 1
                     ).astype(jnp.int32)
    tx_hi = jnp.clip(jnp.floor((xy[:, 0] + wx) / ts), 0, tiles_x - 1
                     ).astype(jnp.int32)
    ty_lo = jnp.clip(jnp.floor((xy[:, 1] - wy) / ts), 0, tiles_y - 1
                     ).astype(jnp.int32)
    ty_hi = jnp.clip(jnp.floor((xy[:, 1] + wy) / ts), 0, tiles_y - 1
                     ).astype(jnp.int32)
    # spans wider than the plan are clamped (footprint corners dropped);
    # plan_flat sizes the span off the scene so this only bites outliers
    tx_hi = jnp.minimum(tx_hi, tx_lo + sx - 1)
    ty_hi = jnp.minimum(ty_hi, ty_lo + sy - 1)

    off = jnp.arange(s_tot, dtype=jnp.int32)
    ox = off % sx            # [S]
    oy = off // sx
    tx = tx_lo[:, None] + ox[None, :]          # [N, S]
    ty = ty_lo[:, None] + oy[None, :]
    in_span = (tx <= tx_hi[:, None]) & (ty <= ty_hi[:, None])

    # exact-bound cull: distance from center to the tile rect, per axis
    rx0 = tx.astype(jnp.float32) * ts
    ry0 = ty.astype(jnp.float32) * ts
    dxm = jnp.maximum(
        jnp.maximum(rx0 - xy[:, 0:1], xy[:, 0:1] - (rx0 + ts)), 0.0)
    dym = jnp.maximum(
        jnp.maximum(ry0 - xy[:, 1:2], xy[:, 1:2] - (ry0 + ts)), 0.0)
    q_lb = _schur_qmin(conic, dxm, dym)
    keep = in_span & valid[:, None] & (q_lb <= thr[:, None])

    tile_id = ty * tiles_x + tx
    key = jnp.where(
        keep,
        (tile_id << bits) | dq[:, None],
        jnp.int32(n_tiles << bits),
    ).reshape(-1)
    gidx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, s_tot)
    ).reshape(-1)

    # one dummy per tile keeps every tile's output block visited (empty
    # tiles must still write alpha=0) — sorts to the back of its tile
    dummy_key = (jnp.arange(n_tiles, dtype=jnp.int32) << bits) | (dq_max + 1)
    key = jnp.concatenate([key, dummy_key])
    gidx = jnp.concatenate(
        [gidx, jnp.full((n_tiles,), n, jnp.int32)])

    skey, sgidx = jax.lax.sort((key, gidx), num_keys=1)

    # per-tile live counts (incl. the dummy): binary-search searchsorted —
    # only n_tiles+1 queries, so the O(T x c) compare_all lowering is ~7 ms
    # of pure waste at flagship shapes; the scan lowering is 21 gathers of
    # [T+1] rows
    starts = jnp.searchsorted(
        skey, (jnp.arange(n_tiles + 1, dtype=jnp.int32) << bits),
        method="scan_unrolled",
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]          # [T] >= 1 (dummy)
    if used_chunks is not None:
        cap = (jax.lax.stop_gradient(jnp.asarray(used_chunks, jnp.int32))
               + trim_slack) * CHUNK
        trimmed = (counts > cap).astype(jnp.int32)
        counts = jnp.minimum(counts, jnp.maximum(cap, 1))
    else:
        trimmed = jnp.zeros((n_tiles,), jnp.int32)
    aligned = -(-counts // CHUNK) * CHUNK
    aoff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned)])
    c_total = aoff[n_tiles]
    overflow = (c_total > c_max).astype(jnp.int32)

    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    pos_t = jnp.clip(aoff[:n_tiles], 0, c_max - 1)
    tile_of_p = _propagate(t_ids, pos_t, c_max)
    aoff_p = _propagate(aoff[:n_tiles], pos_t, c_max)
    roff_p = _propagate(starts[:n_tiles], pos_t, c_max)
    rend_p = _propagate(starts[:n_tiles] + counts, pos_t, c_max)
    anext_p = _propagate(aoff[1:], pos_t, c_max)

    p = jnp.arange(c_max, dtype=jnp.int32)
    slot = p - aoff_p
    src = roff_p + slot
    live = src < rend_p
    gidx_flat = jnp.where(
        live, jnp.take(sgidx, jnp.minimum(src, skey.shape[0] - 1)), n)

    chunk_tile = tile_of_p[::CHUNK]
    chunk_pos = (slot[::CHUNK] // CHUNK).astype(jnp.int32)
    chunk_last = ((p[::CHUNK] + CHUNK) == anext_p[::CHUNK]).astype(jnp.int32)
    chunk_skip = (~live[::CHUNK]).astype(jnp.int32)

    # per-tile chunk ranges for the tile-grid walk kernels: tiles whose
    # aligned range would spill past c_max (overflow) are clamped to empty
    start_c = jnp.minimum(aoff[:n_tiles] // CHUNK, c_max // CHUNK)
    end_c = jnp.minimum(aoff[1:] // CHUNK, c_max // CHUNK)
    tile_chunk_start = start_c.astype(jnp.int32)
    tile_chunk_cnt = jnp.maximum(end_c - start_c, 0).astype(jnp.int32)

    return dict(
        gidx=gidx_flat, chunk_tile=chunk_tile, chunk_pos=chunk_pos,
        chunk_last=chunk_last, chunk_skip=chunk_skip, overflow=overflow,
        tile_chunk_start=tile_chunk_start, tile_chunk_cnt=tile_chunk_cnt,
        trimmed=trimmed,
    )


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size",
                                   "span_x", "span_y"))
def _plan_counts_device(xy, conic, opac, valid, tiles_x, tiles_y, tile_size,
                        span_x, span_y):
    """Per-tile candidate counts mirroring build_flat_candidates' keep logic
    (span clamp + Schur-bound cull) — one device pass."""
    ts = float(tile_size)
    s_tot = span_x * span_y
    wx, wy, thr = _alpha_extents(conic, opac)
    v = valid & (opac >= ALPHA_EPS)
    tx_lo = jnp.clip(jnp.floor((xy[:, 0] - wx) / ts), 0, tiles_x - 1
                     ).astype(jnp.int32)
    tx_hi = jnp.clip(jnp.floor((xy[:, 0] + wx) / ts), 0, tiles_x - 1
                     ).astype(jnp.int32)
    ty_lo = jnp.clip(jnp.floor((xy[:, 1] - wy) / ts), 0, tiles_y - 1
                     ).astype(jnp.int32)
    ty_hi = jnp.clip(jnp.floor((xy[:, 1] + wy) / ts), 0, tiles_y - 1
                     ).astype(jnp.int32)
    tx_hi = jnp.minimum(tx_hi, tx_lo + span_x - 1)
    ty_hi = jnp.minimum(ty_hi, ty_lo + span_y - 1)
    off = jnp.arange(s_tot, dtype=jnp.int32)
    tx = tx_lo[:, None] + (off % span_x)[None, :]
    ty = ty_lo[:, None] + (off // span_x)[None, :]
    in_span = (tx <= tx_hi[:, None]) & (ty <= ty_hi[:, None])
    rx0 = tx.astype(jnp.float32) * ts
    ry0 = ty.astype(jnp.float32) * ts
    dxm = jnp.maximum(
        jnp.maximum(rx0 - xy[:, 0:1], xy[:, 0:1] - (rx0 + ts)), 0.0)
    dym = jnp.maximum(
        jnp.maximum(ry0 - xy[:, 1:2], xy[:, 1:2] - (ry0 + ts)), 0.0)
    q_lb = _schur_qmin(conic, dxm, dym)
    keep = in_span & v[:, None] & (q_lb <= thr[:, None])
    tile_id = jnp.where(keep, ty * tiles_x + tx, tiles_x * tiles_y)
    return jnp.bincount(
        tile_id.reshape(-1), length=tiles_x * tiles_y + 1)[:-1]


def plan_flat(counts_like_xy, conic, opac, valid, tiles_x, tiles_y,
              tile_size, margin: float = 1.3,
              span_cap: int = 8) -> FlatPlan:
    """Probe a projected scene (once per trainer start / densify) and derive
    the static FlatPlan. The span covers every gaussian up to span_cap tiles
    per axis (wider outliers get their footprint corners clamped);
    c_max = margin x the aligned candidate total. Counting runs on device
    (one pass + two small readbacks); the FlatPlan itself is a host-side
    static that keys the jit cache."""
    import numpy as np

    ts = float(tile_size)
    wx, wy, _ = _alpha_extents(jnp.asarray(conic), jnp.asarray(opac))
    xyj = jnp.asarray(counts_like_xy)
    tx_lo = jnp.clip(jnp.floor((xyj[:, 0] - wx) / ts), 0, tiles_x - 1)
    tx_hi = jnp.clip(jnp.floor((xyj[:, 0] + wx) / ts), 0, tiles_x - 1)
    ty_lo = jnp.clip(jnp.floor((xyj[:, 1] - wy) / ts), 0, tiles_y - 1)
    ty_hi = jnp.clip(jnp.floor((xyj[:, 1] + wy) / ts), 0, tiles_y - 1)
    v = jnp.asarray(valid)
    span_x = int(min(span_cap, max(1, int(jnp.max(jnp.where(
        v, tx_hi - tx_lo + 1, 1))))))
    span_y = int(min(span_cap, max(1, int(jnp.max(jnp.where(
        v, ty_hi - ty_lo + 1, 1))))))

    counts = np.asarray(_plan_counts_device(
        xyj, jnp.asarray(conic), jnp.asarray(opac), v,
        tiles_x, tiles_y, tile_size, span_x, span_y))
    aligned = (-(-(counts + 1) // CHUNK) * CHUNK).sum()  # +1 = per-tile dummy
    c_max = int(-(-int(aligned * margin) // CHUNK) * CHUNK)
    return FlatPlan(span_x=span_x, span_y=span_y, c_max=max(c_max, CHUNK))


def plan_trimmed(plan: FlatPlan, tile_chunk_cnt, used_chunks,
                 trim_slack: int = 2, round_chunks: int = 64,
                 margin: float = 1.0) -> FlatPlan:
    """Derive the static capacity for a saturation-trimmed plan: each tile
    keeps min(cnt, used + slack) chunks; the total is rounded UP to
    `round_chunks` chunks so per-frame capacity differences collapse onto
    a few jit cache entries instead of one compile per frame. Host-side
    (two small readbacks) — call once when freezing the trim, not per step."""
    import numpy as np

    cnt = np.asarray(tile_chunk_cnt)
    used = np.asarray(used_chunks)
    total = int(np.minimum(cnt, used + trim_slack).sum())
    total = int(-(-int(total * margin) // round_chunks) * round_chunks)
    total = max(min(total, plan.c_max // CHUNK), 1)
    return FlatPlan(span_x=plan.span_x, span_y=plan.span_y,
                    c_max=total * CHUNK)


# ---------------------------------------------------------------------------
# amortized binning: cacheable index plans + scatter-free gather transpose
# ---------------------------------------------------------------------------


def build_flat_bins(xy, depth, conic, opac, valid,
                    tiles_x: int, tiles_y: int, tile_size: int,
                    plan: FlatPlan, used_chunks=None, trim_slack: int = 2):
    """Index-only binning plan, cacheable across train steps.

    TPU-first amortization (no reference analog — gsplat re-bins every step
    because a CUDA radix sort is ~free; on TPU the bitonic sort IS the cost,
    measured ~80-90% of the flat forward): the returned dict contains ONLY
    integer index arrays, so a trainer may hold one per frame in HBM and
    refresh it every `rebin_every` visits of that frame. Values (positions,
    conics, colors, opacities) are re-gathered through `_planned_take` every
    step, so gradients and the rendered image always use CURRENT parameters;
    staleness only affects (a) candidate membership at the 1/255 cull and
    (b) depth ORDER within a tile — both drift at the parameter step size.
    `overflow` flags when the frozen plan's capacity is outgrown.

    Besides the per-tile walk metadata this precomputes the backward
    transpose plan: `perm` (flat slots sorted by gaussian id) and `bounds`
    (each gaussian's run in that order), which turn the gather's VJP from a
    676k-row scatter-add into gather + cumsum + run-boundary differences —
    entirely on the gather path, never the scatter engine."""
    n = xy.shape[0]
    meta = build_flat_candidates(
        xy, depth, conic, opac, valid,
        tiles_x=tiles_x, tiles_y=tiles_y, tile_size=tile_size, plan=plan,
        used_chunks=used_chunks, trim_slack=trim_slack)
    c_max = plan.c_max
    _, perm = jax.lax.sort(
        (meta["gidx"], jnp.arange(c_max, dtype=jnp.int32)), num_keys=1)
    # bounds via bincount+cumsum: measured FASTER than the searchsorted
    # alternative (r4c probe: binary search = ~20 gather rounds over 100k
    # queries ≈ 2M gather rows, worse than one c_max-element scatter)
    counts = jnp.bincount(meta["gidx"], length=n + 1)
    bounds = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    ).astype(jnp.int32)                              # [n + 2]
    meta["perm"] = perm
    meta["bounds"] = bounds
    # stride-16 projected-position snapshot at plan time: renders against
    # this plan can report max screen drift since binning (the trainer's
    # adaptive-rebin signal — rebins become on-demand instead of periodic;
    # sub-sampling keeps the cached plan small, and drift is a global
    # parameter-step property a subsample captures)
    meta["xy_snap"] = jax.lax.stop_gradient(xy[::DRIFT_STRIDE])
    return meta


DRIFT_STRIDE = 16  # xy_snap sub-sampling (build_flat_bins)


def _f0_like(x):
    import numpy as np

    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


@jax.custom_vjp
def _planned_take(payload, gidx, perm, bounds):
    """jnp.take(payload, gidx, axis=0) whose VJP uses the precomputed
    transpose plan instead of a scatter-add (see build_flat_bins)."""
    return jnp.take(payload, gidx, axis=0)


def _planned_take_fwd(payload, gidx, perm, bounds):
    return jnp.take(payload, gidx, axis=0), (gidx, perm, bounds)


def _planned_take_bwd(res, ct):
    gidx, perm, bounds = res
    r = jnp.take(ct, perm, axis=0)                   # [c_max, D]
    c = jnp.cumsum(r, axis=0, dtype=jnp.float32)
    c = jnp.concatenate([jnp.zeros((1, r.shape[1]), c.dtype), c], axis=0)
    ends = jnp.take(c, bounds, axis=0)               # [n + 2, D]
    dpay = ends[1:] - ends[:-1]                      # [n + 1, D]
    return dpay, _f0_like(gidx), _f0_like(perm), _f0_like(bounds)


_planned_take.defvjp(_planned_take_fwd, _planned_take_bwd)


def _cumsum_2level(r):
    """Inclusive cumsum along axis 0 of [c, d] f32 with c % CHUNK == 0,
    decomposed as (intra-128-block cumsum) + (broadcast block offsets) —
    log2(128)=7 short passes plus a tiny block-level scan, instead of
    XLA's log2(c)~21 full-array passes."""
    c, d = r.shape
    b = c // CHUNK
    rb = r.reshape(b, CHUNK, d)
    intra = jnp.cumsum(rb, axis=1, dtype=jnp.float32)
    tot = intra[:, -1, :]
    offs = jnp.cumsum(tot, axis=0, dtype=jnp.float32) - tot
    return (intra + offs[:, None, :]).reshape(c, d)


def _cumsum_2level_lanes(r):
    """_cumsum_2level in lane-major orientation: [c, d] arrays put d on the
    LANE axis (padded 11 -> 128, ~12x wasted vector work on every pass);
    transposing to [d, B, 128] runs the intra-block cumsum along full
    128-lane vregs (7 shift-add passes) with d on sublanes (padded 11 -> 16,
    1.45x). Two extra transposes bracket it — HOLOSCENE_FLAT_CUMSUM picks
    the winner measured on hardware."""
    c, d = r.shape
    b = c // CHUNK
    rt = jnp.swapaxes(r.reshape(b, CHUNK, d), 1, 2)  # [B, d, 128]
    intra = jnp.cumsum(rt, axis=2, dtype=jnp.float32)
    tot = intra[:, :, -1]                            # [B, d]
    offs = jnp.cumsum(tot, axis=0, dtype=jnp.float32) - tot
    out = intra + offs[:, :, None]
    return jnp.swapaxes(out, 1, 2).reshape(c, d)


def _cumsum_for_bwd(r):
    import os

    if os.environ.get("HOLOSCENE_FLAT_CUMSUM", "blocked") == "lanes":
        return _cumsum_2level_lanes(r)
    return _cumsum_2level(r)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _planned_take_sliced(payload, gidx, perm, bounds, bwd_cols):
    """_planned_take whose VJP (a) only reduces the first `bwd_cols`
    columns (the kernel writes zero cotangents in the pad columns — why
    haul them through the [c_max]-sized reduction) and (b) uses the
    two-level blocked cumsum. Requires payload rows % CHUNK-aligned c_max
    gidx (the composite_tiles_flat contract)."""
    return jnp.take(payload, gidx, axis=0)


def _planned_take_sliced_fwd(payload, gidx, perm, bounds, bwd_cols):
    return jnp.take(payload, gidx, axis=0), (
        payload.shape[1], gidx, perm, bounds)


def _planned_take_sliced_bwd(bwd_cols, res, ct):
    d_full, gidx, perm, bounds = res
    r = jnp.take(ct[:, :bwd_cols], perm, axis=0)     # [c_max, bwd_cols]
    c = _cumsum_for_bwd(r)
    c = jnp.concatenate(
        [jnp.zeros((1, bwd_cols), c.dtype), c], axis=0)
    ends = jnp.take(c, bounds, axis=0)               # [n + 2, bwd_cols]
    dpay = ends[1:] - ends[:-1]                      # [n + 1, bwd_cols]
    dpay = jnp.concatenate(
        [dpay, jnp.zeros((dpay.shape[0], d_full - bwd_cols), dpay.dtype)],
        axis=1)
    return dpay, _f0_like(gidx), _f0_like(perm), _f0_like(bounds)


_planned_take_sliced.defvjp(_planned_take_sliced_fwd,
                            _planned_take_sliced_bwd)


# ---------------------------------------------------------------------------
# Pallas kernels — tile-grid walk with manual double-buffered DMA
# ---------------------------------------------------------------------------
#
# One grid step = ONE TILE; the kernel walks the tile's depth-sorted chunk
# range with a lax.while_loop, DMA-ing each 128-candidate block from HBM
# only when it is actually needed. This is what gives the TPU the shape of
# gsplat's per-pixel early exit (gutRenderer.cu:46): saturated tiles stop
# both COMPUTE and LOADS, dead padding is never touched, and per-tile
# accumulators live in loop carries instead of revisited VMEM scratch.
#
# Candidate layout: cand [n_chunks, 16, 128] f32 — FIELD-major rows
#   0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
#   6 r, 7 g, 8 b, 9 depth, 10 one (alpha payload), 11-15 pad
# — one contiguous 8 KB block per chunk, ONE DMA each. Field-major is
# forced by the DMA engine: HBM chunk slices must be 128-aligned on the
# minor dim (Mosaic rejects [128, 16] blocks), while the payload gather is
# necessarily candidate-ROW-contiguous — the single XLA transpose between
# them IS that layout conversion (tried and measured: a row-major kernel
# layout does not compile).
#
# The within-chunk ordered-compositing prefix sums are [C, C] x [C, P]
# triangular matmuls — the MXU-bound core of the walk. HOLOSCENE_FLAT_MM
# picks their precision (trace-time, process-level):
#   bf16x2 (default) — hi/lo split into two bf16 passes (~f32-accurate,
#            1.5x fewer MXU passes than precision=HIGH's bf16x3);
#   bf16   — single pass (fastest, ~0.2% worst-case transmittance error);
#   f32    — precision=HIGHEST (the v2 behavior).

CAND_ROWS = 16


def _mm_mode() -> str:
    import os

    return os.environ.get("HOLOSCENE_FLAT_MM", "bf16x2")


def _power_mode() -> str:
    """'mxu': per-chunk gaussian exponents via ONE [P,6]@[6,C] matmul over
    TILE-LOCAL coordinates (well-conditioned in f32), gradient rows via a
    [6,P]@[P,C] pixel-moment contraction. Measured NEUTRAL vs 'vpu' on v5e
    (r4c probe: 22.12 vs 22.14 ms/step, gradients bit-identical) — the walk
    is not bound on these VPU ops at CHUNK=128 — so the simpler 'vpu' form
    stays default; the mxu path is kept for wider-chunk variants where the
    tri-matmul balance shifts."""
    import os

    return os.environ.get("HOLOSCENE_FLAT_POWER", "vpu")


def _power_basis(pxl, pyl):
    """F [P,6] = [x^2, xy, y^2, x, y, 1] in tile-local coords."""
    one = jnp.ones_like(pxl)
    return jnp.concatenate(
        [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl, one], axis=1)


def _power_coeffs(ca, cb, cc_, gxl, gyl):
    """Q [6,C] with F @ Q == -0.5 * d^T conic d, d = p - g (tile-local)."""
    q0 = -0.5 * ca
    q1 = -cb
    q2 = -0.5 * cc_
    q3 = ca * gxl + cb * gyl
    q4 = cb * gxl + cc_ * gyl
    q5 = -0.5 * (ca * gxl * gxl + 2.0 * cb * gxl * gyl + cc_ * gyl * gyl)
    return jnp.concatenate([q0, q1, q2, q3, q4, q5], axis=0)


def _tri_dot_r(x, mask, mode):
    """Triangular prefix matmul x [P, C] @ mask [C, C] -> [P, C] f32, with
    the 0/1 mask exact in bf16. See HOLOSCENE_FLAT_MM above."""
    dn = (((1,), (0,)), ((), ()))
    if mode == "f32":
        return jax.lax.dot_general(
            x, mask, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    hi = x.astype(jnp.bfloat16)
    mb = mask.astype(jnp.bfloat16)
    out = jax.lax.dot_general(hi, mb, dn, preferred_element_type=jnp.float32)
    if mode == "bf16x2":
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jax.lax.dot_general(
            lo, mb, dn, preferred_element_type=jnp.float32)
    return out


def _flat_fwd_kernel3(cs_ref, cc_ref, cand_hbm, out_ref, buf, sem,
                      *, tile_size: int, tiles_x: int,
                      img_w: int, img_h: int, mm_mode: str,
                      power_mode: str = "vpu"):
    """Forward tile walk.

    cs/cc: scalar-prefetched per-tile chunk start/count (chunk units).
    cand_hbm: [n_chunks, 16, 128] in ANY/HBM (manual DMA).
    out: [1, P, 8] per tile — rgb(3), depth_acc, alpha, used_chunks,
         total_log1m, pad.
    buf: VMEM (2, 16, 128) double buffer; sem: DMA((2,)).
    """
    t = pl.program_id(0)
    p = tile_size * tile_size
    c0 = cs_ref[t]
    m = cc_ref[t]

    ox = (t % tiles_x) * tile_size
    oy = (t // tiles_x) * tile_size
    pix_id = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (ox + pix_id % tile_size).astype(jnp.float32) + 0.5   # [P, 1]
    py = (oy + pix_id // tile_size).astype(jnp.float32) + 0.5

    if img_w > 0 and img_h > 0:
        in_img = (px < float(img_w)) & (py < float(img_h))
        trans0 = in_img.astype(jnp.float32)
    else:
        trans0 = jnp.ones((p, 1), jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    # cums[p, c] = sum_{r < c} log1m[p, r]  (exclusive prefix over the
    # chunk's depth order) via log1m @ lower
    lower = (row < col).astype(jnp.float32)

    # tile-local pixel basis for the MXU power path (loop-invariant)
    cx = ox + tile_size * 0.5
    cy = oy + tile_size * 0.5
    fbasis = _power_basis(px - cx, py - cy) if power_mode == "mxu" else None

    def dma(kc, slot):
        return pltpu.make_async_copy(
            cand_hbm.at[c0 + kc], buf.at[slot], sem.at[slot])

    @pl.when(m > 0)
    def _prefetch_first():
        dma(0, 0).start()

    def cond(carry):
        kc, trans, _acc, _tot = carry
        return (kc < m) & (jnp.max(trans) > TERM_EPS)

    def body(carry):
        kc, trans, acc, tot = carry
        slot = jax.lax.rem(kc, 2)

        @pl.when(kc + 1 < m)
        def _prefetch_next():
            dma(kc + 1, jax.lax.rem(kc + 1, 2)).start()

        dma(kc, slot).wait()
        c = buf[slot]                     # [16, C]
        gx, gy = c[0:1, :], c[1:2, :]     # [1, C]
        ca, cb, cc_ = c[2:3, :], c[3:4, :], c[4:5, :]
        op = c[5:6, :]
        if power_mode == "mxu":
            q = _power_coeffs(ca, cb, cc_, gx - cx, gy - cy)    # [6, C]
            power = jax.lax.dot_general(
                fbasis, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGH)
        else:
            dx = px - gx                  # [P, C]
            dy = py - gy
            power = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy
                            + cc_ * dy * dy)
        a = jnp.minimum(0.999, op * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where(a >= ALPHA_EPS, a, 0.0)

        log1m = jnp.log1p(-a)
        cums = _tri_dot_r(log1m, lower, mm_mode)               # [P, C]
        w = a * jnp.exp(cums) * trans     # [P, C]
        acc = acc + jax.lax.dot_general(
            w, c[6:10, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH)  # [P, 4]
        csum = jnp.sum(log1m, axis=1, keepdims=True)           # [P, 1]
        return kc + 1, trans * jnp.exp(csum), acc, tot + csum

    kc, trans, acc, tot = jax.lax.while_loop(
        cond, body,
        (0, trans0, jnp.zeros((p, 4), jnp.float32),
         jnp.zeros((p, 1), jnp.float32)),
    )

    # an early exit leaves DMA(kc) in flight (started by iteration kc-1 or
    # the warmup); consume its semaphore before this grid step ends
    @pl.when(kc < m)
    def _drain():
        dma(kc, jax.lax.rem(kc, 2)).wait()

    used = jnp.full((p, 1), 1.0, jnp.float32) * kc.astype(jnp.float32)
    # ch 7: this tile consumed its whole chunk range while still live —
    # on a saturation-TRIMMED plan that means possible truncation (the
    # staleness signal); on a full plan it's just "tile never saturated"
    ended_live = jnp.full((p, 1), 1.0, jnp.float32) * (
        (kc >= m) & (jnp.max(trans) > TERM_EPS)).astype(jnp.float32)
    out_ref[0, :, :] = jnp.concatenate(
        [acc, 1.0 - trans, used, tot, ended_live], axis=1)


def _flat_bwd_kernel3(cs_ref, cc_ref, cand_hbm, fwd_ref, v_ref, dcand_hbm,
                      buf, obuf, sem, osem,
                      *, tile_size: int, tiles_x: int,
                      img_w: int, img_h: int, n_chunks: int, mm_mode: str,
                      power_mode: str = "vpu"):
    """Reverse tile walk over the chunks the forward actually composited.

    fwd: [1, P, 8] forward outputs (used in ch 5, total log1m in ch 6).
    v:   [1, P, 8] output cotangents (chs drgb(3), ddepth_acc, dalpha; chs
         5-7 pair with zero payload rows, so their values are inert).
    dcand_hbm: [n_chunks, 16, 128] gradient blocks (ANY/HBM, DMA'd out).
    Chunks this tile owns but did NOT walk (early termination) are zeroed
    here by DMA-ing a zero block — no XLA-side mask pass; the LAST tile also
    zeroes the aligned tail beyond the final tile's range (those slots are
    trash-row candidates, but uninitialized HBM could be NaN and a NaN
    anywhere poisons the downstream prefix-sum reduction).
    buf/obuf: VMEM (2, 16, 128) in/out staging; sem/osem: DMA((2,)).
    """
    t = pl.program_id(0)
    p = tile_size * tile_size
    c0 = cs_ref[t]
    cnt = cc_ref[t]
    used = fwd_ref[0, 0, 5].astype(jnp.int32)

    ox = (t % tiles_x) * tile_size
    oy = (t // tiles_x) * tile_size
    pix_id = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (ox + pix_id % tile_size).astype(jnp.float32) + 0.5   # [P, 1]
    py = (oy + pix_id // tile_size).astype(jnp.float32) + 0.5

    if img_w > 0 and img_h > 0:
        in_img = ((px < float(img_w)) & (py < float(img_h))
                  ).astype(jnp.float32)
    else:
        in_img = jnp.ones((p, 1), jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    lower = (row < col).astype(jnp.float32)   # prefix: sum_{r < c}
    upper = (row > col).astype(jnp.float32)   # suffix: sum_{r > c}

    # tile-local pixel basis: powers the MXU exponent AND the pixel-moment
    # reduction M = F^T @ dpow (rows: x^2, xy, y^2, x, y, 1 moments), from
    # which every conic/position gradient row reconstructs on [1,C] vregs
    cx = ox + tile_size * 0.5
    cy = oy + tile_size * 0.5
    fbasis = _power_basis(px - cx, py - cy) if power_mode == "mxu" else None

    total = fwd_ref[0, :, 6:7]            # [P, 1]
    v = v_ref[0]                          # [P, 8]

    def dma_in(j, slot):
        # reverse walk: j-th visited chunk is used-1-j
        return pltpu.make_async_copy(
            cand_hbm.at[c0 + used - 1 - j], buf.at[slot], sem.at[slot])

    def dma_out(j, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], dcand_hbm.at[c0 + used - 1 - j], osem.at[slot])

    @pl.when(used > 0)
    def _prefetch_first():
        dma_in(0, 0).start()

    def body(j, carry):
        suffix, s_after = carry           # [P, 1] each
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < used)
        def _prefetch_next():
            dma_in(j + 1, jax.lax.rem(j + 1, 2)).start()

        dma_in(j, slot).wait()
        c = buf[slot]                     # [16, C]
        gx, gy = c[0:1, :], c[1:2, :]
        ca, cb, cc_ = c[2:3, :], c[3:4, :], c[4:5, :]
        op = c[5:6, :]
        if power_mode == "mxu":
            gxl, gyl = gx - cx, gy - cy   # [1, C]
            q = _power_coeffs(ca, cb, cc_, gxl, gyl)
            power = jax.lax.dot_general(
                fbasis, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGH)
        else:
            dx = px - gx                  # [P, C]
            dy = py - gy
            power = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy
                            + cc_ * dy * dy)
        e = jnp.exp(jnp.minimum(power, 0.0))
        a_pre = op * e
        a_cap = jnp.minimum(0.999, a_pre)
        keep = a_cap >= ALPHA_EPS
        a = jnp.where(keep, a_cap, 0.0)

        log1m = jnp.log1p(-a)
        csum = jnp.sum(log1m, axis=1, keepdims=True)           # [P, 1]
        prefix = total - suffix - csum
        log_t = prefix + _tri_dot_r(log1m, lower, mm_mode)
        tr = jnp.exp(log_t) * in_img      # [P, C]
        w = a * tr

        s = jax.lax.dot_general(
            v, c[6:14, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH)  # [P, C]
        ws = w * s
        s_k = _tri_dot_r(ws, upper, mm_mode) + s_after

        da = tr * s - s_k / (1.0 - a)
        da = jnp.where(keep & (a_pre < 0.999), da, 0.0)
        dpow = jnp.where(power < 0.0, da * a, 0.0)

        def red(x):
            return jnp.sum(x, axis=0, keepdims=True)  # [1, C]

        # wait for the previous use of this output slot before overwriting
        @pl.when(j >= 2)
        def _reclaim():
            pltpu.make_async_copy(
                obuf.at[slot], dcand_hbm.at[c0 + used + 1 - j],
                osem.at[slot]).wait()

        du = jax.lax.dot_general(
            v[:, 0:4], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH)  # [4, C]
        if power_mode == "mxu":
            # pixel moments of dpow: one [6,P]@[P,C] MXU contraction
            # replaces the five [P,C]-sized gradient-row products
            mm = jax.lax.dot_general(
                fbasis, dpow, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGH)
            mx2, mxy, my2 = mm[0:1, :], mm[1:2, :], mm[2:3, :]
            mx, my, m0 = mm[3:4, :], mm[4:5, :], mm[5:6, :]
            ex = mx - gxl * m0            # red(dpow * dx)
            ey = my - gyl * m0
            obuf[slot] = jnp.concatenate([
                ca * ex + cb * ey,
                cb * ex + cc_ * ey,
                -0.5 * (mx2 - 2.0 * gxl * mx + gxl * gxl * m0),
                -(mxy - gxl * my - gyl * mx + gxl * gyl * m0),
                -0.5 * (my2 - 2.0 * gyl * my + gyl * gyl * m0),
                red(da * e),
                du,
                jnp.zeros((6, CHUNK), jnp.float32),
            ], axis=0)                    # [16, C]
        else:
            obuf[slot] = jnp.concatenate([
                red(dpow * (ca * dx + cb * dy)),
                red(dpow * (cb * dx + cc_ * dy)),
                red(dpow * (-0.5 * dx * dx)),
                red(dpow * (-dx * dy)),
                red(dpow * (-0.5 * dy * dy)),
                red(da * e),
                du,
                jnp.zeros((6, CHUNK), jnp.float32),
            ], axis=0)                    # [16, C]
        dma_out(j, slot).start()

        return suffix + csum, s_after + jnp.sum(ws, axis=1, keepdims=True)

    jax.lax.fori_loop(
        0, used, body,
        (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32)),
    )

    # drain the last (up to two) output DMAs
    @pl.when(used >= 1)
    def _drain_last():
        pltpu.make_async_copy(
            obuf.at[jax.lax.rem(used - 1, 2)], dcand_hbm.at[c0],
            osem.at[jax.lax.rem(used - 1, 2)]).wait()

    @pl.when(used >= 2)
    def _drain_prev():
        pltpu.make_async_copy(
            obuf.at[jax.lax.rem(used - 2, 2)], dcand_hbm.at[c0 + 1],
            osem.at[jax.lax.rem(used - 2, 2)]).wait()

    # zero every chunk this tile owns but did not walk. Tile chunk ranges
    # tile in the flat array contiguously (end_c(t) == start_c(t+1), both
    # cumsum-derived), so extending the LAST tile's zero range to n_chunks
    # covers the aligned tail too — between them, every dcand chunk is
    # either walked-and-written or zeroed.
    zend = jnp.where(t == pl.num_programs(0) - 1, n_chunks - c0, cnt)

    @pl.when(zend > used)
    def _zero_unwalked():
        obuf[0] = jnp.zeros((CAND_ROWS, CHUNK), jnp.float32)
        obuf[1] = jnp.zeros((CAND_ROWS, CHUNK), jnp.float32)

        def zdma(j, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], dcand_hbm.at[c0 + j], osem.at[slot])

        def zbody(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j >= used + 2)
            def _reclaim_z():
                zdma(j - 2, slot).wait()

            zdma(j, slot).start()
            return carry

        jax.lax.fori_loop(used, zend, zbody, 0)

        @pl.when(zend - used >= 1)
        def _zdrain_last():
            zdma(zend - 1, jax.lax.rem(zend - 1, 2)).wait()

        @pl.when(zend - used >= 2)
        def _zdrain_prev():
            zdma(zend - 2, jax.lax.rem(zend - 2, 2)).wait()



# ---------------------------------------------------------------------------
# custom_vjp core over the packed candidate blocks
# ---------------------------------------------------------------------------


def _fwd_call3(cand, cs, cc, n_tiles, tile_size, tiles_x, img_w, img_h,
               interpret, mm_mode, power_mode="vpu"):
    p = tile_size * tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CAND_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_flat_fwd_kernel3, tile_size=tile_size, tiles_x=tiles_x,
                img_w=img_w, img_h=img_h, mm_mode=mm_mode,
                power_mode=power_mode),
        out_shape=jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cs, cc, cand)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _flat_core(cand, cs, cc, n_tiles, tile_size, tiles_x, img_w, img_h,
               interpret, mm_mode, power_mode="vpu"):
    """Composite the packed candidate blocks [n_chunks, 16, 128].
    Returns the raw per-tile output block [T, P, 8] — channels rgb(3),
    depth_acc (unnormalized), alpha, used_chunks, total_log1m,
    ended-live flag — so the VJP receives its cotangent in kernel-native
    orientation (callers slice; channels 5-7 are non-differentiable
    diagnostics whose cotangents pair with zero payload rows)."""
    return _fwd_call3(cand, cs, cc, n_tiles, tile_size, tiles_x, img_w,
                      img_h, interpret, mm_mode, power_mode)


def _flat_core_fwd(cand, cs, cc, n_tiles, tile_size, tiles_x, img_w, img_h,
                   interpret, mm_mode, power_mode="vpu"):
    out = _fwd_call3(cand, cs, cc, n_tiles, tile_size, tiles_x, img_w,
                     img_h, interpret, mm_mode, power_mode)
    return out, (cand, cs, cc, out)


def _flat_core_bwd(n_tiles, tile_size, tiles_x, img_w, img_h, interpret,
                   mm_mode, power_mode, res, d_out):
    cand, cs, cc, out = res
    n_chunks = cand.shape[0]
    p = tile_size * tile_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CAND_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, CAND_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dcand = pl.pallas_call(
        partial(_flat_bwd_kernel3, tile_size=tile_size, tiles_x=tiles_x,
                img_w=img_w, img_h=img_h, n_chunks=n_chunks,
                mm_mode=mm_mode, power_mode=power_mode),
        out_shape=jax.ShapeDtypeStruct((n_chunks, CAND_ROWS, CHUNK),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cs, cc, cand, out, d_out)

    import numpy as np

    def f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return dcand, f0(cs), f0(cc)


_flat_core.defvjp(_flat_core_fwd, _flat_core_bwd)


# ---------------------------------------------------------------------------
# public renderer
# ---------------------------------------------------------------------------


def composite_tiles_flat(
    xy, depth, conic, opac, rgb, valid,
    width: int, height: int, tile_size: int, plan: FlatPlan,
    bins: dict | None = None,
    interpret: bool = False,
):
    """Project-space entry: bins + composites projected gaussians exactly
    (no per-tile K truncation). Returns (rgb [T,P,3], depth_norm [T,P],
    alpha [T,P], flags) with T = padded tile count — callers share
    ops/splat.py's tiles_to_image epilogue. flags is a dict:
      overflow    [] int32 — scene outgrew the plan's capacity
      stale       [] int32 — a saturation-TRIMMED tile walked its whole
                  shortened range while live (possible truncation; re-plan)
      used_chunks [T] int32 — chunks each tile actually composited (feed
                  back into build_flat_bins(used_chunks=...) to trim)

    `bins`: a cached build_flat_bins plan (amortized binning). When given,
    the per-step cost is gathers + tile walks only; when None, a fresh plan
    is built inline (exact per-step binning, the expensive path)."""
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    n_tiles = tiles_x * tiles_y
    n = xy.shape[0]
    n_chunks = plan.c_max // CHUNK

    if bins is None:
        bins = build_flat_bins(
            xy, depth, conic, opac, valid, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_size=tile_size, plan=plan)

    # candidate payload fetch: ONE 16-wide row gather whose reshape IS the
    # kernel's row-major chunk layout (no transpose, no pad pass); row N is
    # the dead/trash row. Columns: x y ca cb cc op r g b z 1 pad(5).
    import os as _os

    if _os.environ.get("HOLOSCENE_FLAT_PAYT", "0") == "1":
        # transposed build: stack the 11 sources as [11, N] rows (minor-N,
        # no lane padding on the writes) and transpose ONCE into the
        # row-major gather source — the direct [N, 16] concat measured
        # 3.1 ms at flagship shapes (fwd_parts r4: every [N, few] slice
        # write pays the 128-lane pad)
        pay_t = jnp.stack(
            [xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
             opac, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth,
             jnp.ones((n,), xy.dtype)], axis=0)                # [11, N]
        pay_t = jnp.concatenate(
            [pay_t, jnp.zeros((CAND_ROWS - 11, n), pay_t.dtype)], axis=0)
        pay_t = jnp.concatenate(
            [pay_t, jnp.zeros((CAND_ROWS, 1), pay_t.dtype)], axis=1)
        payload = pay_t.T                                      # [N+1, 16]
    else:
        payload = jnp.concatenate(
            [xy, conic, opac[:, None], rgb, depth[:, None],
             jnp.ones((n, 1), xy.dtype),
             jnp.zeros((n, CAND_ROWS - 11), xy.dtype)], axis=-1)  # [N, 16]
        payload = jnp.concatenate(
            [payload, jnp.zeros((1, CAND_ROWS), payload.dtype)], axis=0)
    cand_rows = _planned_take_sliced(
        payload, bins["gidx"], bins["perm"], bins["bounds"],
        11)                                          # [c_max, 16]
    # row-major gather -> field-major DMA blocks: the ONE layout conversion
    # (the DMA engine needs 128-minor chunk slices; see the kernel section)
    cand = jnp.swapaxes(
        cand_rows.reshape(n_chunks, CHUNK, CAND_ROWS), 1, 2)

    out = _flat_core(
        cand, bins["tile_chunk_start"], bins["tile_chunk_cnt"],
        n_tiles, tile_size, tiles_x, width, height, interpret, _mm_mode(),
        _power_mode())
    rgb_t = out[:, :, :3]                            # [T, P, 3]
    depth_acc = out[:, :, 3]
    alpha = out[:, :, 4]
    depth_norm = depth_acc / jnp.maximum(alpha, 1e-10)
    diag = jax.lax.stop_gradient(out[:, 0, 5:8])     # [T, 3]
    used = diag[:, 0].astype(jnp.int32)
    ended_live = diag[:, 2] > 0.5
    trimmed = bins.get("trimmed")
    if trimmed is None:
        stale = jnp.zeros((), jnp.int32)
    else:
        stale = jnp.any(ended_live & (trimmed > 0)).astype(jnp.int32)
    flags = {"overflow": bins["overflow"], "stale": stale,
             "used_chunks": used}
    if "xy_snap" in bins:
        # max screen-space drift (px) since the plan was binned — the
        # trainer's adaptive-rebin signal (sub-pixel drift = memberships
        # and depth order still valid; rebinning would be wasted sort work)
        cur = jax.lax.stop_gradient(xy[::DRIFT_STRIDE])
        flags["xy_drift"] = jnp.max(jnp.abs(cur - bins["xy_snap"]))
    return rgb_t, depth_norm, alpha, flags
