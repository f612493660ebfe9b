"""Pallas TPU kernels: per-tile front-to-back gaussian compositing (fwd+bwd).

The pure-JAX tile renderer (ops/splat.py) materializes [tiles, K, pixels]
alpha/transmittance tensors in HBM (~33 MB per tile chunk at K=512). These
kernels keep the whole compositing loop in VMEM and on the MXU: each grid
program owns one tile and walks its K depth-sorted gaussians in lane-dim
chunks (default 128; `chunk_size`, any multiple of 128) —

  * alpha for a chunk is one [P, 128] VPU broadcast (pixels in sublanes,
    gaussians in lanes);
  * the within-chunk exclusive transmittance cumprod is a log-space cumsum
    expressed as a [P,128] x [128,128] strictly-lower-triangular matmul
    (MXU), carried across chunks by a running [P,1] transmittance;
  * color/depth accumulation is a second [P,128] x [128,4] matmul.

The backward kernel implements the gsplat-style closed form (reference
vendors it as CUDA back-to-front traversal, threedgut_tracer): with
s_k = <u_k, v> the per-gaussian output-cotangent dot,

    dL/da_k = T_k * s_k - S_k / (1 - a_k),   S_k = sum_{j>k} w_j s_j,

walking chunks in REVERSE with [P,1] carries for the suffix weight-sum and
suffix log-transmittance; within a chunk the suffix sums are
strictly-triangular MXU matmuls (the transpose of the forward's cumsum
trick). Inputs are recomputed per chunk instead of stashing [P,K] residuals.

No dynamic scalar indexing (Mosaic requires lane starts provably divisible
by 128, which the chunk layout guarantees). `composite_tiles_pallas` is
fully differentiable via jax.custom_vjp, so Stage-4 gaussian training can
run through the fused path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_CHUNK = 128


TERM_EPS = 1e-4  # stop a tile once every pixel's transmittance is below this
# (gsplat terminates per pixel at 1e-4; per-tile max is the SIMD analog)


def _composite_tile_kernel(xy_ref, conic_ref, rgbz_ref, op_ref, origin_ref,
                           count_ref, out_ref, *, tile_size: int,
                           cumprod_mode: str = "log", chunk: int = K_CHUNK,
                           img_w: int = 0, img_h: int = 0):
    """One program = one tile.

    Block shapes:
      xy     [1, 2, K]    (row 0 = x, row 1 = y)
      conic  [1, 4, K]    (rows a, b, c, pad)
      rgbz   [1, K, 4]    (r, g, b, depth)
      op     [1, 1, K]    (opacity * live)
      origin [1, 1, 2]    (SMEM)
      count  [1, 1, 2]    (SMEM int32, live-prefix length duplicated)
      out    [1, P, 8]    (r, g, b, depth_sum, alpha, used, pad, pad —
                           channel 5 carries the number of chunks walked
                           before saturation, broadcast over pixels)

    The walk stops at ceil(count / K_CHUNK) chunks: per-tile lists are
    depth-sorted with dead padding at the END (ops/splat.py approx_max_k
    over -depth), so cost tracks each tile's ACTUAL overlap instead of
    the global max_per_tile bound — the TPU analog of gsplat's per-tile
    variable-length ranges.
    """
    p = tile_size * tile_size
    k_total = op_ref.shape[2]
    n_chunks = jnp.minimum(
        k_total // chunk,
        (count_ref[0, 0, 0] + chunk - 1) // chunk,
    )

    pix_id = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).astype(jnp.float32)
    px = origin_ref[0, 0, 0] + (pix_id % tile_size) + 0.5  # [P, 1]
    py = origin_ref[0, 0, 1] + (pix_id // tile_size) + 0.5

    # strictly-lower-triangular ones: cumsum_exclusive along lanes via MXU
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    lower = (row < col).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, chunk), 1)

    def cond(carry):
        kc, trans, _ = carry
        # chunks are depth-sorted front-to-back: once the whole tile is
        # saturated nothing behind can contribute above TERM_EPS
        return (kc < n_chunks) & (jnp.max(trans) > TERM_EPS)

    def body(carry):
        kc, trans, acc = carry  # [P, 1], [P, 4]
        lo = pl.multiple_of(kc * chunk, chunk)
        gx = xy_ref[0, 0:1, pl.ds(lo, chunk)]  # [1, C]
        gy = xy_ref[0, 1:2, pl.ds(lo, chunk)]
        ca = conic_ref[0, 0:1, pl.ds(lo, chunk)]
        cb = conic_ref[0, 1:2, pl.ds(lo, chunk)]
        cc = conic_ref[0, 2:3, pl.ds(lo, chunk)]
        op = op_ref[0, 0:1, pl.ds(lo, chunk)]
        rgbz = rgbz_ref[0, pl.ds(lo, chunk), :]  # [C, 4]

        dx = px - gx  # [P, C]
        dy = py - gy
        power = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy)
        a = jnp.minimum(0.999, op * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where(a >= 1.0 / 255.0, a, 0.0)  # [P, C]

        if cumprod_mode == "scan":
            # transcendental-free within-chunk cumprod: log2(C) rounds of
            # lane-rolled multiplies (the walk is VPU/transcendental bound,
            # not MXU bound — PERF.md stage-4 attribution). Products of
            # (1-a) in f32 are exact enough (positive, <= 1) and skip the
            # log1p+exp round trip of the matmul trick.
            one_m = 1.0 - a
            y = one_m  # inclusive cumprod after the rounds below
            s = 1
            while s < chunk:
                y = y * jnp.where(lane >= s, pltpu.roll(y, s, 1), 1.0)
                s *= 2
            t_ex = jnp.where(lane >= 1, pltpu.roll(y, 1, 1), 1.0)
            w = a * t_ex * trans  # [P, C]
            chunk_total = jnp.sum(
                jnp.where(lane == chunk - 1, y, 0.0), axis=1, keepdims=True
            )
            acc = acc + jnp.dot(w, rgbz, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            trans = trans * chunk_total
            return kc + 1, trans, acc

        log1m = jnp.log1p(-a)
        # HIGHEST: the MXU's default bf16 rounding costs ~1e-3 in the
        # accumulated transmittance; these matmuls are not the bottleneck.
        cums = jnp.dot(log1m, lower, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        w = a * jnp.exp(cums) * trans  # [P, C]

        acc = acc + jnp.dot(w, rgbz, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        trans = trans * jnp.exp(
            jnp.sum(log1m, axis=1, keepdims=True)
        )
        return kc + 1, trans, acc

    if img_w > 0 and img_h > 0:
        # edge tiles: out-of-image pixels start fully saturated (trans=0) so
        # the saturation early-exit tracks only real pixels; their outputs
        # (alpha=1, rgb=0) lie beyond the caller's [:height, :width] crop
        valid = (px < float(img_w)) & (py < float(img_h))
        trans0 = valid.astype(jnp.float32)
    else:
        trans0 = jnp.ones((p, 1), jnp.float32)
    acc0 = jnp.zeros((p, 4), jnp.float32)
    kc, trans, acc = jax.lax.while_loop(cond, body, (0, trans0, acc0))

    used_col = jnp.full((p, 1), 1.0, jnp.float32) * kc.astype(jnp.float32)
    out = jnp.concatenate(
        [acc, 1.0 - trans, used_col, jnp.zeros((p, 2), jnp.float32)], axis=1
    )
    out_ref[0, :, :] = out


def _composite_bwd_kernel(xy_ref, conic_ref, op_ref, u_ref, v_ref, origin_ref,
                          used_ref, dgeom_ref, du_ref, *, tile_size: int,
                          chunk: int = K_CHUNK):
    """One program = one tile, reverse chunk walk over the chunks the
    forward actually composited (used_ref; gaussians behind the saturation
    point carry < TERM_EPS of weight — gsplat truncates them identically).

    Block shapes:
      xy     [1, 2, K]   conic [1, 4, K]   op [1, 1, K]
      u      [1, 8, K]   (rows r, g, b, z, 1, 0, 0, 0 — per-gaussian payload)
      v      [1, P, 8]   (cols = cotangents of rgb(3), depth_acc, alpha, pad)
      origin [1, 1, 2]   (SMEM)
      used   [1, 1, 2]   (SMEM int32, value duplicated)
      dgeom  [1, 8, K]   (rows dgx, dgy, dca, dcb, dcc, dop, 0, 0)
      du     [1, 8, K]   (rows drgb(3), dz, d<ones> (ignored), pad)
    """
    p = tile_size * tile_size
    k_total = op_ref.shape[2]
    n_chunks = used_ref[0, 0, 0]

    # zero everything first; only the walked chunks get real gradients
    dgeom_ref[0, :, :] = jnp.zeros((8, k_total), jnp.float32)
    du_ref[0, :, :] = jnp.zeros((8, k_total), jnp.float32)

    pix_id = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).astype(jnp.float32)
    px = origin_ref[0, 0, 0] + (pix_id % tile_size) + 0.5  # [P, 1]
    py = origin_ref[0, 0, 1] + (pix_id // tile_size) + 0.5

    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    lower = (row < col).astype(jnp.float32)   # exclusive prefix along lanes
    upper = (row > col).astype(jnp.float32)   # exclusive suffix along lanes

    def chunk_geom(lo):
        gx = xy_ref[0, 0:1, pl.ds(lo, chunk)]
        gy = xy_ref[0, 1:2, pl.ds(lo, chunk)]
        ca = conic_ref[0, 0:1, pl.ds(lo, chunk)]
        cb = conic_ref[0, 1:2, pl.ds(lo, chunk)]
        cc = conic_ref[0, 2:3, pl.ds(lo, chunk)]
        op = op_ref[0, 0:1, pl.ds(lo, chunk)]
        dx = px - gx  # [P, C]
        dy = py - gy
        power = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy)
        e = jnp.exp(jnp.minimum(power, 0.0))
        a_pre = op * e
        a_cap = jnp.minimum(0.999, a_pre)
        keep = a_cap >= 1.0 / 255.0
        a = jnp.where(keep, a_cap, 0.0)
        return dx, dy, ca, cb, cc, e, a_pre, a, keep, power

    # pass 1: total log-transmittance per pixel (so the reverse walk can
    # reconstruct T_k = exp(total - suffix) without storing [P, K])
    def body1(kc, tot):
        lo = pl.multiple_of(kc * chunk, chunk)
        a = chunk_geom(lo)[7]
        return tot + jnp.sum(jnp.log1p(-a), axis=1, keepdims=True)

    total = jax.lax.fori_loop(
        0, n_chunks, body1, jnp.zeros((p, 1), jnp.float32)
    )

    v = v_ref[0]  # [P, 8]

    def body2(i, carry):
        suffix_log, s_after = carry  # [P, 1] each
        c = n_chunks - 1 - i
        lo = pl.multiple_of(c * chunk, chunk)
        dx, dy, ca, cb, cc, e, a_pre, a, keep, power = chunk_geom(lo)
        u = u_ref[0, :, pl.ds(lo, chunk)]  # [8, C]

        log1m = jnp.log1p(-a)
        chunk_sum = jnp.sum(log1m, axis=1, keepdims=True)
        prefix = total - suffix_log - chunk_sum  # log T at chunk entry
        log_t = prefix + jnp.dot(
            log1m, lower, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        tr = jnp.exp(log_t)  # [P, C] transmittance in front of each gaussian
        w = a * tr

        s = jnp.dot(v, u, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [P, C]
        ws = w * s
        s_k = jnp.dot(ws, upper, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + s_after

        da = tr * s - s_k / (1.0 - a)
        da = jnp.where(keep & (a_pre < 0.999), da, 0.0)
        dpow = jnp.where(power < 0.0, da * a, 0.0)

        def red(x):  # reduce over pixels (sublanes) -> [1, C]
            return jnp.sum(x, axis=0, keepdims=True)

        sl = pl.ds(lo, chunk)
        dgeom_ref[0, 0:1, sl] = red(dpow * (ca * dx + cb * dy))
        dgeom_ref[0, 1:2, sl] = red(dpow * (cb * dx + cc * dy))
        dgeom_ref[0, 2:3, sl] = red(dpow * (-0.5 * dx * dx))
        dgeom_ref[0, 3:4, sl] = red(dpow * (-dx * dy))
        dgeom_ref[0, 4:5, sl] = red(dpow * (-0.5 * dy * dy))
        dgeom_ref[0, 5:6, sl] = red(da * e)
        zero_row = jnp.zeros((1, chunk), jnp.float32)
        dgeom_ref[0, 6:7, sl] = zero_row
        dgeom_ref[0, 7:8, sl] = zero_row
        for ch in range(8):
            du_ref[0, ch:ch + 1, sl] = red(v[:, ch:ch + 1] * w)

        return (
            suffix_log + chunk_sum,
            s_after + jnp.sum(ws, axis=1, keepdims=True),
        )

    jax.lax.fori_loop(
        0, n_chunks, body2,
        (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32)),
    )


def _core_fwd_impl(g_xy, g_conic, g_rgb, g_op, g_z, origins, counts,
                   tile_size, interpret, cumprod_mode="log",
                   chunk=K_CHUNK, img_w=0, img_h=0):
    t, k = g_op.shape
    p = tile_size * tile_size
    xy_t = jnp.swapaxes(g_xy, 1, 2)  # [T, 2, K]
    conic_t = jnp.concatenate(
        [jnp.swapaxes(g_conic, 1, 2), jnp.zeros((t, 1, k))], axis=1
    )  # [T, 4, K]
    rgbz = jnp.concatenate([g_rgb, g_z[..., None]], axis=-1)  # [T, K, 4]
    op = g_op[:, None, :]  # [T, 1, K]
    # counts rides the custom_vjp boundary as float32 (int args would need
    # float0 cotangents); the kernel wants SMEM int32
    ci = counts.astype(jnp.int32)
    counts2 = jnp.stack([ci, ci], axis=-1)[:, None, :]  # [T, 1, 2]

    out = pl.pallas_call(
        partial(_composite_tile_kernel, tile_size=tile_size,
                cumprod_mode=cumprod_mode, chunk=chunk, img_w=img_w,
                img_h=img_h),
        out_shape=jax.ShapeDtypeStruct((t, p, 8), jnp.float32),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 2, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xy_t, conic_t, rgbz, op, origins[:, None, :], counts2)
    used = out[:, 0:1, 5].astype(jnp.int32)  # [T, 1]
    return out[:, :, :3], out[:, :, 3], out[:, :, 4], used


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _composite_core(g_xy, g_conic, g_rgb, g_op, g_z, origins, counts,
                    tile_size, interpret, cumprod_mode, chunk, img_w, img_h):
    """Fused tile compositing; returns (rgb [T,P,3], depth_acc [T,P],
    alpha [T,P]) — depth is UNNORMALIZED. K must be a K_CHUNK multiple;
    g_op is the effective (live-masked) opacity; counts [T] int32 bounds
    each tile's walk to its live prefix."""
    rgb, depth_acc, alpha, _ = _core_fwd_impl(
        g_xy, g_conic, g_rgb, g_op, g_z, origins, counts, tile_size,
        interpret, cumprod_mode, chunk, img_w, img_h
    )
    return rgb, depth_acc, alpha


def _core_fwd(g_xy, g_conic, g_rgb, g_op, g_z, origins, counts, tile_size,
              interpret, cumprod_mode, chunk, img_w, img_h):
    rgb, depth_acc, alpha, used = _core_fwd_impl(
        g_xy, g_conic, g_rgb, g_op, g_z, origins, counts, tile_size,
        interpret, cumprod_mode, chunk, img_w, img_h
    )
    return (rgb, depth_acc, alpha), (g_xy, g_conic, g_rgb, g_op, g_z, origins,
                                     counts, used)


def _core_bwd(tile_size, interpret, cumprod_mode, chunk, img_w, img_h,
              res, cts):
    g_xy, g_conic, g_rgb, g_op, g_z, origins, counts, used = res
    ct_rgb, ct_depth, ct_alpha = cts
    t, k = g_op.shape
    p = tile_size * tile_size

    xy_t = jnp.swapaxes(g_xy, 1, 2)
    conic_t = jnp.concatenate(
        [jnp.swapaxes(g_conic, 1, 2), jnp.zeros((t, 1, k))], axis=1
    )
    op = g_op[:, None, :]
    ones = jnp.ones((t, k), jnp.float32)
    zero = jnp.zeros((t, k), jnp.float32)
    u_t = jnp.stack(
        [g_rgb[..., 0], g_rgb[..., 1], g_rgb[..., 2], g_z, ones,
         zero, zero, zero],
        axis=1,
    )  # [T, 8, K]
    v = jnp.concatenate(
        [ct_rgb, ct_depth[..., None], ct_alpha[..., None],
         jnp.zeros((t, p, 3), jnp.float32)],
        axis=-1,
    )  # [T, P, 8]

    dgeom, du = pl.pallas_call(
        partial(_composite_bwd_kernel, tile_size=tile_size, chunk=chunk),
        out_shape=(
            jax.ShapeDtypeStruct((t, 8, k), jnp.float32),
            jax.ShapeDtypeStruct((t, 8, k), jnp.float32),
        ),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 2, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xy_t, conic_t, op, u_t, v, origins[:, None, :],
      jnp.concatenate([used, used], axis=-1)[:, None, :])

    d_xy = jnp.stack([dgeom[:, 0, :], dgeom[:, 1, :]], axis=-1)
    d_conic = jnp.stack(
        [dgeom[:, 2, :], dgeom[:, 3, :], dgeom[:, 4, :]], axis=-1
    )
    d_op = dgeom[:, 5, :]
    d_rgb = jnp.stack([du[:, 0, :], du[:, 1, :], du[:, 2, :]], axis=-1)
    d_z = du[:, 3, :]
    return (d_xy, d_conic, d_rgb, d_op, d_z, jnp.zeros_like(origins),
            jnp.zeros_like(counts))


_composite_core.defvjp(_core_fwd, _core_bwd)


def composite_tiles_pallas(*args, cumprod_mode=None, chunk_size=None, **kw):
    """Un-jitted entry: resolves the HOLOSCENE_SPLAT_{CUMPROD,CHUNK} env
    A/B knobs EAGERLY so flipping them between calls in one process takes
    effect (the jitted inner would otherwise bake the first-seen value
    into its cache key — ADVICE r2)."""
    import os

    if chunk_size is None:
        # A/B knob (PERF.md stage-4 walk attribution): 256 halves the number
        # of loop trips / per-trip overheads; must stay a multiple of 128
        # (Mosaic lane-start divisibility)
        chunk_size = int(os.environ.get("HOLOSCENE_SPLAT_CHUNK", str(K_CHUNK)))
    if cumprod_mode is None:
        # experimental A/B knob: "scan" replaces the forward's log-space
        # cumprod with lane-rolled multiplies; backward is
        # formulation-independent (custom_vjp)
        cumprod_mode = os.environ.get("HOLOSCENE_SPLAT_CUMPROD", "log")
    return _composite_tiles_pallas_jit(
        *args, cumprod_mode=cumprod_mode, chunk_size=chunk_size, **kw)


@partial(jax.jit, static_argnames=("tile_size", "interpret",
                                    "cumprod_mode", "chunk_size",
                                    "img_w", "img_h"))
def _composite_tiles_pallas_jit(
    g_xy: jnp.ndarray,      # [T, K, 2]
    g_conic: jnp.ndarray,   # [T, K, 3]
    g_rgb: jnp.ndarray,     # [T, K, 3]
    g_op: jnp.ndarray,      # [T, K]
    g_z: jnp.ndarray,       # [T, K]
    live: jnp.ndarray,      # [T, K] float (0/1)
    origins: jnp.ndarray,   # [T, 2] float tile pixel origins
    tile_size: int = 16,
    interpret: bool = False,
    n_live: jnp.ndarray | None = None,  # [T] live-prefix length per tile
    cumprod_mode: str | None = None,    # "log" | "scan"; None -> env/default
    chunk_size: int | None = None,      # lane-chunk length; None -> env/128
    img_w: int = 0,                     # image extent for edge-tile
    img_h: int = 0,                     # saturation masking (0 = off)
):
    """Returns (rgb [T, P, 3], depth [T, P] alpha-normalized, alpha [T, P]).

    Differentiable w.r.t. g_xy/g_conic/g_rgb/g_op/g_z/live via the fused
    Pallas backward kernel. NOTE alpha here is 1 - prod(1 - a_i) over ALL
    lanes — identical to the JAX renderer's sum of weights.

    `n_live` (when the caller's per-tile lists are depth-sorted with dead
    entries at the END, as ops/splat.py's approx_max_k selection yields)
    bounds each tile's chunk walk to its live prefix: per-tile cost tracks
    actual overlap instead of the global K bound. Omitted -> every tile
    walks all K lanes (identical results, just slower)."""
    assert chunk_size % K_CHUNK == 0, chunk_size
    k = g_op.shape[1]
    pad = (-k) % chunk_size
    if pad:
        def padk(x, fill=0.0):
            shape = list(x.shape)
            shape[1] = pad
            return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=1)

        g_xy, g_conic, g_rgb, g_op, g_z, live = (
            padk(g_xy), padk(g_conic), padk(g_rgb), padk(g_op), padk(g_z),
            padk(live),
        )
    k_pad = k + pad
    if n_live is None:
        counts = jnp.full((g_op.shape[0],), float(k_pad), jnp.float32)
    else:
        counts = n_live.astype(jnp.float32)

    rgb, depth_acc, alpha = _composite_core(
        g_xy, g_conic, g_rgb, g_op * live, g_z, origins, counts, tile_size,
        interpret, cumprod_mode, chunk_size, img_w, img_h
    )
    return rgb, depth_acc / jnp.maximum(alpha, 1e-10), alpha
