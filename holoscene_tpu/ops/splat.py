"""Tile-based Gaussian splat renderer (gsplat replacement), pure JAX.

Reference counterpart: gsplat's `rasterization(render_mode="RGB+ED")`
(model/gom.py:1120-1142): project -> tile binning -> depth-sorted
front-to-back alpha compositing, with RGB, expected depth, and accumulation
outputs; fully differentiable w.r.t. means/quats/scales/opacities/colors.

TPU-first shape (static everywhere):
  * projection (EWA, classic 0.3px blur) over all N gaussians at once;
  * tile binning as a dense [tiles, N] depth matrix, processed in fixed tile
    chunks: gaussians that miss a tile get +inf depth;
  * per-tile candidate selection with `jax.lax.approx_max_k` over -depth —
    the TPU-native top-k (SIMD bucketing, returns sorted) — giving each
    tile its K nearest overlapping gaussians front-to-back;
  * compositing as a cumprod over the K axis for all tile pixels at once.

Truncation at K per tile is the static-shape analog of gsplat's per-tile
fragment limits; transmittance saturates long before K=512 in practice.
Gradients flow through projection/weights/colors (selection indices are
non-differentiable, like any z-buffer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from holoscene_tpu.ops.gaussians import covariance_3d, eval_sh, project_gaussians


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "ortho"),
)
def tile_overlap_counts(
    means, quats, scales, viewmat, intrinsics,
    width: int, height: int, tile_size: int = 16, ortho: bool = False,
):
    """Per-tile overlapping-gaussian counts [n_tiles] int32 for one camera.
    Host-side probe used to pick max_per_tile from the scene's actual tile
    occupancy instead of a worst-case constant (compositing cost is linear
    in K — PERF.md)."""
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    n_tiles = tiles_x * tiles_y
    tile_chunk = min(64, n_tiles)

    cov3d = covariance_3d(quats, scales)
    xy, depth, conic, radius, valid = project_gaussians(
        means, cov3d, viewmat, intrinsics, width, height, ortho=ortho
    )
    t_idx = jnp.arange(n_tiles)
    tx0 = (t_idx % tiles_x) * tile_size
    ty0 = (t_idx // tiles_x) * tile_size
    n_chunks = -(-n_tiles // tile_chunk)
    pad = n_chunks * tile_chunk - n_tiles
    if pad:
        tx0 = jnp.concatenate([tx0, jnp.zeros(pad, tx0.dtype)])
        ty0 = jnp.concatenate([ty0, jnp.zeros(pad, ty0.dtype)])

    def count_chunk(carry, chunk_idx):
        x0 = jax.lax.dynamic_slice_in_dim(tx0, chunk_idx * tile_chunk,
                                          tile_chunk)
        y0 = jax.lax.dynamic_slice_in_dim(ty0, chunk_idx * tile_chunk,
                                          tile_chunk)
        gx = xy[None, :, 0]
        gy = xy[None, :, 1]
        # invalid (behind-camera/off-screen) gaussians must count in NO
        # tile: a -1 radius only shrinks the footprint by 1px and still
        # counts when the clamped projection lands inside a tile, inflating
        # p99 and the auto-picked K. A large negative sentinel empties the
        # interval, matching the render path's depth=inf masking.
        r = jnp.where(valid, radius, -1e9)[None, :]
        overlap = (
            (gx + r >= x0[:, None])
            & (gx - r <= x0[:, None] + tile_size)
            & (gy + r >= y0[:, None])
            & (gy - r <= y0[:, None] + tile_size)
        )
        return carry, overlap.sum(axis=1).astype(jnp.int32)

    _, counts = jax.lax.scan(count_chunk, None, jnp.arange(n_chunks))
    return counts.reshape(-1)[:n_tiles]


def auto_max_per_tile(
    counts, percentile: float = 99.0, lo: int = 64, hi: int = 1024
) -> int:
    """Pick the compositing depth K from tile-overlap statistics: the p99
    tile occupancy rounded up to a power of two, clamped to [lo, hi].
    Tiles deeper than K still terminate correctly (transmittance saturates);
    K bounds the per-step cost, which is linear in it (K=256 measured 2x
    faster than 512 at the flagship stage-4 shapes).

    Geometric overlap is an UPPER bound on the useful depth — with opaque
    content transmittance saturates long before deep tiles are exhausted.
    Use `calibrate_max_per_tile` to refine the pick empirically."""
    import numpy as np

    c = np.asarray(counts).reshape(-1)
    if c.size == 0:
        return lo
    p = float(np.percentile(c, percentile))
    k = lo
    while k < p and k < hi:
        k *= 2
    return int(min(max(k, lo), hi))


def calibrate_max_per_tile(
    render_k, lo: int = 64, hi: int = 1024, psnr_thresh: float = 45.0,
    verbose: bool = False,
) -> int:
    """Empirical compositing-depth pick: double K until the render stops
    changing (PSNR(render(K), render(2K)) >= psnr_thresh), i.e. until the
    gaussians truncated past K are hidden behind saturated transmittance.

    `render_k(k) -> rgb array` renders ONE representative camera at
    compositing depth k. At most log2(hi/lo)+1 probe renders — negligible
    at trainer start, and unlike an analytic saturation model it is exact
    for the scene at hand: truncation error decays with the footprint-
    coverage-discounted alpha (a tile's list entries only partially cover
    each pixel), which geometry-free models get badly wrong (measured 28 dB
    truncation error on a dense slab where the p99-overlap pick was exact).
    gsplat needs no such knob only because its per-pixel CUDA walk is
    dynamic; a static-shape TPU kernel buys the same effect by bounding K
    at the measured saturation depth."""
    import numpy as np

    lo = max(1, int(lo))
    hi = max(lo, int(hi))
    k = lo
    prev = np.asarray(render_k(k))
    while k < hi:
        k2 = min(2 * k, hi)
        cur = np.asarray(render_k(k2))
        mse = float(np.mean((prev - cur) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        if verbose:
            print(f"[calibrate_max_per_tile] K={k} vs {k2}: {psnr:.1f} dB")
        if psnr >= psnr_thresh:
            return k
        k, prev = k2, cur
    return hi


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_size", "max_per_tile", "sh_degree",
        "use_pallas", "ortho", "camera_model", "dist", "fetch",
        "cumprod", "chunk", "flat_plan", "chw",
    ),
)
def render_gaussians(
    means: jnp.ndarray,          # [N, 3]
    quats: jnp.ndarray,          # [N, 4] (w,x,y,z), need not be normalized
    scales: jnp.ndarray,         # [N, 3] linear scales
    opacities: jnp.ndarray,      # [N] in [0, 1]
    colors: jnp.ndarray,         # [N, 3] rgb or [N, B, 3] SH coeffs
    viewmat: jnp.ndarray,        # [4, 4] world-to-camera
    intrinsics: jnp.ndarray,     # [3, 3]
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 512,
    sh_degree: int | None = None,
    background: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
    ortho: bool = False,
    camera_model: str = "pinhole",
    dist: tuple | None = None,
    viewmat_end: jnp.ndarray | None = None,
    fetch: str | None = None,
    cumprod: str | None = None,
    chunk: int | None = None,
    flat_plan=None,
    flat_bins: dict | None = None,
    chw: bool = False,
):
    """Returns dict(rgb [H,W,3], depth [H,W] alpha-normalized expected depth,
    alpha [H,W]). chw=True returns rgb as [3,H,W] (channels-major; the
    training-loss layout — see _image_epilogue).

    use_pallas composites through the fused Pallas tile kernels
    (ops/splat_pallas.py), differentiable via the custom-VJP backward
    kernel. Default None = auto: enabled on TPU (measured 1.76x faster
    fwd+bwd at 512^2/100k gaussians/K=512, gradients matching to ~1e-6),
    JAX compositor elsewhere.

    camera_model != "pinhole" (opencv / fisheye distortion, `dist` coeffs)
    or a `viewmat_end` (linear rolling shutter) switches projection from
    EWA linearization to the unscented transform over sigma points
    (ops/gaussians.project_gaussians_ut) — the 3DGUT capability the
    reference gets from its CUDA UT rasterizer (threedgut_tracer).

    flat_plan (ops/splat_flat.FlatPlan, static): switches binning +
    compositing to the flat sorted-candidate pipeline — no per-tile K
    truncation (`max_per_tile` is ignored), cost tracks actual tile
    overlap, and the gsplat-style saturation calibration disappears.
    Probe it once per scene with ops/splat_flat.plan_flat.

    flat_bins (dict of index arrays from ops/splat_flat.build_flat_bins):
    a cached binning plan for the amortized-binning fast path — the
    dominant per-step sort cost is paid only when the caller refreshes the
    plan (e.g. every few visits of a frame). Requires flat_plan."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = means.shape[0]
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    n_tiles = tiles_x * tiles_y
    tile_chunk = min(64, n_tiles)

    if camera_model != "pinhole" or viewmat_end is not None:
        assert not ortho, "UT projection is perspective-only"
        from holoscene_tpu.ops.gaussians import (
            project_gaussians_ut,
            quat_to_rotmat,
        )

        sqrt_cov = quat_to_rotmat(quats) * scales[..., None, :]
        xy, depth, conic, radius, valid = project_gaussians_ut(
            means, sqrt_cov, viewmat, intrinsics, width, height,
            camera_model=camera_model, dist=dist, viewmat_end=viewmat_end,
        )
    else:
        # scalar-channel fused projection: [N]-vector math end to end (the
        # einsum form's [N,3,3]/[N,2,3] intermediates pay the 128-lane
        # minor-dim pad; r5g measured its fwd+bwd at 8.2 ms @ 100k)
        from holoscene_tpu.ops.gaussians import project_gaussians_fused

        xy, depth, conic, radius, valid = project_gaussians_fused(
            means, quats, scales, viewmat, intrinsics, width, height,
            ortho=ortho
        )

    if sh_degree is not None:
        cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        dirs = means - cam_pos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
        )
        rgb_n = jnp.clip(eval_sh(colors, dirs, sh_degree), 0.0, None)
    else:
        rgb_n = colors

    if flat_plan is not None:
        from holoscene_tpu.ops.splat_flat import composite_tiles_flat

        rgb_t, depth_norm_t, alpha_t, flags = composite_tiles_flat(
            xy, depth, conic, opacities, rgb_n, valid,
            width, height, tile_size, flat_plan, bins=flat_bins,
            interpret=jax.default_backend() != "tpu",
        )
        out = _image_epilogue(
            rgb_t, depth_norm_t * alpha_t, alpha_t, tiles_x, tiles_y,
            tile_size, width, height, background, chw=chw,
        )
        # cached-bins callers watch these to trigger a replan: overflow =
        # capacity outgrown; stale = a saturation-trimmed tile may truncate;
        # used_chunks feeds the next trim (splat_flat.build_flat_bins)
        out["overflow"] = flags["overflow"]
        out["stale"] = flags["stale"]
        out["used_chunks"] = flags["used_chunks"]
        if "xy_drift" in flags:
            out["xy_drift"] = flags["xy_drift"]
        return out

    # tile geometry
    t_idx = jnp.arange(n_tiles)
    tx0 = (t_idx % tiles_x) * tile_size
    ty0 = (t_idx // tiles_x) * tile_size

    k = min(max_per_tile, n)

    # pixel offsets within a tile [tile_size^2, 2]
    py, px = jnp.mgrid[0:tile_size, 0:tile_size]
    pix_off = jnp.stack(
        [px.reshape(-1) + 0.5, py.reshape(-1) + 0.5], axis=-1
    )  # [P, 2]

    depth_masked_base = jnp.where(valid, depth, jnp.inf)

    def select_tile_chunk(chunk_idx):
        """Per-tile gaussian selection: K nearest overlapping, sorted
        front-to-back (shared by the JAX and Pallas compositors)."""
        x0 = jax.lax.dynamic_slice_in_dim(tx0, chunk_idx * tile_chunk, tile_chunk)
        y0 = jax.lax.dynamic_slice_in_dim(ty0, chunk_idx * tile_chunk, tile_chunk)

        # overlap test: gaussian circle vs tile rect [Tc, N]
        gx = xy[None, :, 0]
        gy = xy[None, :, 1]
        r = radius[None, :]
        overlap = (
            (gx + r >= x0[:, None])
            & (gx - r <= x0[:, None] + tile_size)
            & (gy + r >= y0[:, None])
            & (gy - r <= y0[:, None] + tile_size)
        )
        neg_depth = jnp.where(overlap, -depth_masked_base[None, :], -jnp.inf)
        top_vals, top_idx = jax.lax.approx_max_k(neg_depth, k)  # [Tc, K]
        live = jnp.isfinite(top_vals)
        return x0, y0, live, top_idx

    def render_tile_chunk(carry, chunk_idx):
        x0, y0, live, top_idx = select_tile_chunk(chunk_idx)

        g_xy = xy[top_idx]            # [Tc, K, 2]
        g_conic = conic[top_idx]      # [Tc, K, 3]
        g_rgb = rgb_n[top_idx]        # [Tc, K, 3]
        g_op = opacities[top_idx]     # [Tc, K]
        g_z = depth[top_idx]          # [Tc, K]

        # pixel coords of this chunk's tiles [Tc, P, 2]
        pix = (
            pix_off[None, :, :]
            + jnp.stack([x0, y0], axis=-1)[:, None, :]
        )
        d = pix[:, None, :, :] - g_xy[:, :, None, :]  # [Tc, K, P, 2]
        dx = d[..., 0]
        dy = d[..., 1]
        power = -0.5 * (
            g_conic[..., 0, None] * dx * dx
            + 2.0 * g_conic[..., 1, None] * dx * dy
            + g_conic[..., 2, None] * dy * dy
        )
        alpha = jnp.minimum(
            0.999, g_op[..., None] * jnp.exp(jnp.minimum(power, 0.0))
        )  # [Tc, K, P]
        alpha = jnp.where(live[..., None] & (alpha >= 1.0 / 255.0), alpha, 0.0)

        # front-to-back transmittance over the K axis
        trans = jnp.cumprod(1.0 - alpha, axis=1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1
        )
        w = alpha * trans  # [Tc, K, P]

        # HIGHEST: the MXU's default bf16 rounding costs ~1e-3 rgb error;
        # these contractions are bandwidth-bound, so exactness is ~free.
        rgb_tile = jnp.einsum("tkp,tkc->tpc", w, g_rgb,
                              precision=jax.lax.Precision.HIGHEST)
        depth_tile = jnp.einsum("tkp,tk->tp", w, g_z,
                                precision=jax.lax.Precision.HIGHEST)
        alpha_tile = w.sum(axis=1)
        return carry, (rgb_tile, depth_tile, alpha_tile)

    n_chunks = -(-n_tiles // tile_chunk)
    # pad tile arrays so chunks divide evenly
    pad = n_chunks * tile_chunk - n_tiles
    if pad:
        tx0 = jnp.concatenate([tx0, jnp.zeros(pad, tx0.dtype)])
        ty0 = jnp.concatenate([ty0, jnp.zeros(pad, ty0.dtype)])

    if use_pallas:
        import os

        from holoscene_tpu.ops.splat_pallas import composite_tiles_pallas

        def select_only(carry, chunk_idx):
            x0, y0, live, top_idx = select_tile_chunk(chunk_idx)
            return carry, (x0, y0, live, top_idx)

        _, (x0s, y0s, lives, top_idxs) = jax.lax.scan(
            select_only, None, jnp.arange(n_chunks)
        )
        top_idx = top_idxs.reshape(-1, k)[:n_tiles]
        live = lives.reshape(-1, k)[:n_tiles].astype(jnp.float32)
        origins = jnp.stack(
            [x0s.reshape(-1), y0s.reshape(-1)], axis=-1
        )[:n_tiles].astype(jnp.float32)

        # fetch is static (part of the jit cache key); the env var is only
        # the process-level default for A/B probes
        if fetch is None:
            # packed default (2026-08-19 A/B, idle chip, 100k/512^2/K=512):
            # fwd+bwd 35.2 ms vs split's 67.9 ms (1.93x), bitwise-identical
            # renders — the gather engine costs per ROW, and the backward
            # becomes one row scatter instead of five element scatters
            fetch = os.environ.get("HOLOSCENE_SPLAT_FETCH", "packed")
        if fetch == "packed":
            # experimental A/B (PERF.md stage-4 attribution): ONE width-16
            # row gather fetches the whole candidate payload — the gather
            # engine costs per ROW, and the backward becomes one row
            # scatter instead of five element scatters. Whether XLA keeps
            # the [T, K, 16] intermediate lane-compact decides the win;
            # bench deltas only (layout traps, PERF.md pitfalls).
            payload = jnp.concatenate(
                [xy, conic, rgb_n, opacities[:, None], depth[:, None],
                 jnp.zeros((n, 6), xy.dtype)], axis=-1,
            )  # [N, 16]
            cand = jnp.take(payload, top_idx.reshape(-1), axis=0).reshape(
                n_tiles, k, 16
            )
            g_xy, g_conic, g_rgb = (
                cand[..., 0:2], cand[..., 2:5], cand[..., 5:8]
            )
            g_op, g_z = cand[..., 8], cand[..., 9]
        else:
            g_xy, g_conic, g_rgb = xy[top_idx], conic[top_idx], rgb_n[top_idx]
            g_op, g_z = opacities[top_idx], depth[top_idx]

        rgb_t, depth_tn, alpha_t = composite_tiles_pallas(
            g_xy, g_conic, g_rgb,
            g_op * live, g_z,
            jnp.ones_like(live), origins, tile_size=tile_size,
            cumprod_mode=cumprod, chunk_size=chunk,
            # Mosaic kernels only lower on TPU; fall back to the pallas
            # interpreter elsewhere so the flag works on any backend.
            interpret=jax.default_backend() != "tpu",
            # approx_max_k puts dead (-inf depth) entries at the end, so
            # live is a prefix — its sum bounds each tile's chunk walk
            n_live=live.sum(axis=1),
            # lets edge tiles' saturation early-exit ignore the out-of-image
            # pixels (they never saturate otherwise); those pixels fall
            # outside the [:height, :width] crop below
            img_w=width, img_h=height,
        )
        # re-accumulate the unnormalized depth for a shared epilogue
        depth_t = depth_tn * alpha_t
    else:
        _, (rgb_t, depth_t, alpha_t) = jax.lax.scan(
            render_tile_chunk, None, jnp.arange(n_chunks)
        )
        # [n_chunks, Tc, P(,C)] -> [n_tiles_padded, P(,C)]
        rgb_t = rgb_t.reshape(-1, tile_size * tile_size, 3)[:n_tiles]
        depth_t = depth_t.reshape(-1, tile_size * tile_size)[:n_tiles]
        alpha_t = alpha_t.reshape(-1, tile_size * tile_size)[:n_tiles]

    return _image_epilogue(rgb_t, depth_t, alpha_t, tiles_x, tiles_y,
                           tile_size, width, height, background, chw=chw)


def _image_epilogue(rgb_t, depth_t, alpha_t, tiles_x, tiles_y, tile_size,
                    width, height, background, chw: bool = False):
    """[n_tiles, P(,C)] tile buffers -> image dict (shared by the top-K and
    flat pipelines).

    chw=True emits rgb as [3, H, W] (channels-major): the whole downstream
    loss then runs W-minor instead of 3-minor, skipping the 128-lane pad
    every [H, W, 3] elementwise op pays (PERF.md r4 attribution; eval /
    export callers keep the HWC default)."""

    def tiles_to_image(tiles_flat, channels):
        img = tiles_flat.reshape(
            tiles_y, tiles_x, tile_size, tile_size, channels
        )
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * tile_size, tiles_x * tile_size, channels
        )
        return img[:height, :width]

    def tiles_to_image_chw(tiles_flat, channels):
        img = tiles_flat.reshape(
            tiles_y, tiles_x, tile_size, tile_size, channels
        )
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            channels, tiles_y * tile_size, tiles_x * tile_size
        )
        return img[:, :height, :width]

    if chw:
        rgb = tiles_to_image_chw(rgb_t, 3)                       # [3, H, W]
        alpha = tiles_to_image_chw(alpha_t[..., None], 1)[0]
        depth_acc = tiles_to_image_chw(depth_t[..., None], 1)[0]
        depth_norm = depth_acc / jnp.maximum(alpha, 1e-10)
        if background is not None:
            rgb = rgb + (1.0 - alpha[None]) * background[:, None, None]
        return {"rgb": rgb, "depth": depth_norm, "alpha": alpha}

    rgb = tiles_to_image(rgb_t, 3)
    alpha = tiles_to_image(alpha_t[..., None], 1)[..., 0]
    depth_acc = tiles_to_image(depth_t[..., None], 1)[..., 0]
    depth_norm = depth_acc / jnp.maximum(alpha, 1e-10)

    if background is not None:
        rgb = rgb + (1.0 - alpha[..., None]) * background[None, None, :]
    return {"rgb": rgb, "depth": depth_norm, "alpha": alpha}
