"""Ray-traced 3D Gaussians — the TPU-native analog of the 3DGRT tracer.

Reference counterpart: threedgrt_tracer (OptiX BVH over per-particle proxy
primitives; hit math in include/3dgrt/kernels/cuda/gaussianParticles.cuh:
343-396 `processHit`, response families :242-283 `particleResponse`). The
capability it provides over the tile rasterizer is per-ray rendering: exact
distorted cameras (fisheye), arbitrary ray batches (secondary rays), and a
depth at each particle's point of maximum response along the ray.

TPU-first redesign — no BVH, no warp-level k-buffers:

  * a BVH is a pointer-chasing structure; the TPU analog of "find the hits"
    is a STREAMING TOP-K: gaussians are processed in fixed-size blocks
    inside a `lax.scan`, each block's per-ray hit distances are merged with
    the running K best via `jax.lax.approx_max_k` (the TPU-native top-k,
    SIMD bucketing, returns sorted) — every op is a dense [rays, block]
    vector op on the VPU;
  * hit ordering: approx_max_k over -hitT yields each ray's K nearest
    accepted particles front-to-back, the static-shape analog of OptiX's
    sorted traversal with a 16-deep k-buffer;
  * compositing is the same front-to-back cumprod as ops/splat.py, over
    all rays at once.

Truncation at K hits per ray mirrors the rasterizer's max_per_tile: rays
deeper than K still terminate correctly once transmittance saturates, K
bounds the static cost. Gradients flow through response/weights/colors
(selection indices are non-differentiable, like any traversal order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from holoscene_tpu.ops.gaussians import eval_sh, quat_to_rotmat

# generalized gaussian response exp(s_n * grayDist^(n/2)), s_n = -4.5/3^n
# (gaussianParticles.cuh:242-283; degree 2 is the standard gaussian)
_KERNEL_SCALES = {1: -1.5, 2: -0.5, 4: -1.0 / 18.0, 8: -4.5 / 6561.0}


def _ray_hits(means, inv_scales, rot, opacities, rays_o, rays_d,
              kernel_degree: int):
    """Per (ray, particle) hit quantities, all [R, N].

    Canonical-frame math (gaussianParticles.cuh:352-362): the ray is moved
    into the particle's unit-sphere frame; the squared distance of that
    line to the origin is the minimal Mahalanobis distance along the ray.
    """
    # local = R^T (x - mu), scaled by 1/s  -> [R, N, 3]
    oc = rays_o[:, None, :] - means[None, :, :]
    gro = jnp.einsum("nij,rnj->rni", jnp.swapaxes(rot, -1, -2), oc)
    gro = gro * inv_scales[None, :, :]
    dl = jnp.einsum("nij,rj->rni", jnp.swapaxes(rot, -1, -2), rays_d)
    grdu = dl * inv_scales[None, :, :]
    grd = grdu / jnp.maximum(
        jnp.linalg.norm(grdu, axis=-1, keepdims=True), 1e-12
    )
    # |cross(grd, gro)|^2 = |gro|^2 - dot(grd, gro)^2  (|grd| = 1)
    t_proj = -jnp.einsum("rni,rni->rn", grd, gro)
    gray_dist = jnp.maximum(
        jnp.einsum("rni,rni->rn", gro, gro) - t_proj * t_proj, 0.0
    )
    s = _KERNEL_SCALES[kernel_degree]
    if kernel_degree == 2:
        resp = jnp.exp(s * gray_dist)
    elif kernel_degree == 4:
        resp = jnp.exp(s * gray_dist * gray_dist)
    elif kernel_degree == 8:
        gd2 = gray_dist * gray_dist
        resp = jnp.exp(s * gd2 * gd2)
    else:  # 1, Laplacian
        resp = jnp.exp(s * jnp.sqrt(jnp.maximum(gray_dist, 1e-20)))
    alpha = jnp.minimum(0.99, resp * opacities[None, :])
    # world-space distance to the max-response point: |s * grd * t_proj|
    # in the canonical frame (processHit :371-372)
    grds = (grd * t_proj[..., None]) / inv_scales[None, :, :]
    hit_t = jnp.linalg.norm(grds, axis=-1)
    return resp, alpha, hit_t, t_proj


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "max_hits", "block", "kernel_degree", "with_normal"
    ),
)
def trace_gaussians(
    means: jnp.ndarray,          # [N, 3]
    quats: jnp.ndarray,          # [N, 4]
    scales: jnp.ndarray,         # [N, 3] linear scales
    opacities: jnp.ndarray,      # [N]
    sh_coeffs: jnp.ndarray,      # [N, B, 3]
    rays_o: jnp.ndarray,         # [R, 3]
    rays_d: jnp.ndarray,         # [R, 3] unit
    sh_degree: int = 3,
    max_hits: int = 128,
    min_alpha: float = 1.0 / 255.0,
    min_kernel: float = 0.0113,
    near: float = 1e-4,
    block: int = 2048,
    kernel_degree: int = 2,
    with_normal: bool = False,
):
    """Trace rays through a gaussian mixture. Returns dict with
    rgb [R,3], depth [R], alpha [R] (+ normal [R,3] when requested).

    Acceptance thresholds follow processHit (:366): a particle contributes
    when its kernel response exceeds min_kernel AND its alpha exceeds
    min_alpha; hits behind the origin (t <= near) are discarded.
    """
    n = means.shape[0]
    r = rays_o.shape[0]
    k = min(max_hits, n)
    pad = (-n) % block
    if pad:
        means = jnp.concatenate(
            [means, jnp.zeros((pad, 3), means.dtype)])
        quats = jnp.concatenate(
            [quats, jnp.tile(jnp.asarray([1.0, 0, 0, 0], quats.dtype),
                             (pad, 1))])
        scales = jnp.concatenate(
            [scales, jnp.full((pad, 3), 1e-6, scales.dtype)])
        opacities = jnp.concatenate(
            [opacities, jnp.zeros((pad,), opacities.dtype)])
    rot = quat_to_rotmat(quats)
    inv_scales = 1.0 / jnp.maximum(scales, 1e-12)
    n_blocks = (n + pad) // block

    # ---- streaming nearest-K selection (the "BVH traversal") ----
    def select_block(carry, b):
        best_neg_t, best_idx = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * block, block)
        resp, alpha, hit_t, t_proj = _ray_hits(
            sl(means), sl(inv_scales), sl(rot), sl(opacities),
            rays_o, rays_d, kernel_degree,
        )
        accept = (resp > min_kernel) & (alpha > min_alpha) & (t_proj > near)
        neg_t = jnp.where(accept, -hit_t, -jnp.inf)
        idx = b * block + jnp.arange(block, dtype=jnp.int32)[None, :]
        cand_t = jnp.concatenate([best_neg_t, neg_t], axis=1)
        cand_i = jnp.concatenate(
            [best_idx, jnp.broadcast_to(idx, (r, block))], axis=1
        )
        top_t, top_pos = jax.lax.approx_max_k(cand_t, k)
        top_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
        return (top_t, top_i), None

    init = (
        jnp.full((r, k), -jnp.inf, jnp.float32),
        jnp.zeros((r, k), jnp.int32),
    )
    (neg_t, hit_idx), _ = jax.lax.scan(
        select_block, init, jnp.arange(n_blocks)
    )
    valid = jnp.isfinite(neg_t)  # [R, K], sorted front-to-back

    # ---- recompute responses for the selected hits and composite ----
    flat_idx = hit_idx.reshape(-1)
    m_k = means[flat_idx].reshape(r, k, 3)
    is_k = inv_scales[flat_idx].reshape(r, k, 3)
    rot_k = rot[flat_idx].reshape(r, k, 3, 3)
    op_k = opacities[flat_idx].reshape(r, k)

    oc = rays_o[:, None, :] - m_k
    gro = jnp.einsum("rkij,rkj->rki", jnp.swapaxes(rot_k, -1, -2), oc) * is_k
    dl = jnp.einsum("rkij,rj->rki", jnp.swapaxes(rot_k, -1, -2), rays_d)
    grdu = dl * is_k
    grd = grdu / jnp.maximum(
        jnp.linalg.norm(grdu, axis=-1, keepdims=True), 1e-12
    )
    t_proj = -jnp.einsum("rki,rki->rk", grd, gro)
    gray_dist = jnp.maximum(
        jnp.einsum("rki,rki->rk", gro, gro) - t_proj * t_proj, 0.0
    )
    s = _KERNEL_SCALES[kernel_degree]
    if kernel_degree == 2:
        resp = jnp.exp(s * gray_dist)
    elif kernel_degree == 4:
        resp = jnp.exp(s * gray_dist * gray_dist)
    elif kernel_degree == 8:
        gd2 = gray_dist * gray_dist
        resp = jnp.exp(s * gd2 * gd2)
    else:
        resp = jnp.exp(s * jnp.sqrt(jnp.maximum(gray_dist, 1e-20)))
    alpha = jnp.where(valid, jnp.minimum(0.99, resp * op_k), 0.0)
    hit_t = jnp.linalg.norm(
        (grd * t_proj[..., None]) / is_k, axis=-1
    )

    # front-to-back compositing (same form as ops/splat.py)
    trans = jnp.cumprod(1.0 - alpha + 1e-12, axis=1)
    trans = jnp.concatenate(
        [jnp.ones((r, 1), trans.dtype), trans[:, :-1]], axis=1
    )
    weight = alpha * trans  # [R, K]

    # radiance from SH at each hit, view dir = the ray's direction
    sh_k = sh_coeffs[flat_idx]  # [R*K, B, 3]
    dirs = jnp.broadcast_to(
        rays_d[:, None, :], (r, k, 3)
    ).reshape(-1, 3)
    rgb_k = jnp.clip(eval_sh(sh_k, dirs, sh_degree), 0.0, None)
    rgb_k = rgb_k.reshape(r, k, 3)

    out = {
        "rgb": jnp.einsum("rk,rkc->rc", weight, rgb_k),
        "depth": jnp.einsum("rk,rk->r", weight, hit_t),
        "alpha": weight.sum(axis=1),
    }
    if with_normal:
        # ellipsoid surface normal at the response point, scaled back to
        # world (processHit :386-390, ellipsoidSqRadius = 9)
        root = jnp.sqrt(jnp.maximum(9.0 - gray_dist, 0.0))
        p_surf = gro + grd * (t_proj - root)[..., None]
        nrm_c = p_surf / jnp.maximum(
            jnp.linalg.norm(p_surf, axis=-1, keepdims=True), 1e-12
        )
        nrm_w = jnp.einsum("rkij,rkj->rki", rot_k, nrm_c / is_k)
        nrm_w = nrm_w / jnp.maximum(
            jnp.linalg.norm(nrm_w, axis=-1, keepdims=True), 1e-12
        )
        out["normal"] = jnp.einsum("rk,rki->ri", weight, nrm_w)
    return out


# ---------------------------------------------------------------------------
# ray generators — the tracer's reason to exist: exact distorted cameras
# ---------------------------------------------------------------------------


def pinhole_rays(pose_c2w, intrinsics, width: int, height: int):
    """[H*W, 3] origins + unit directions (world), OpenCV convention."""
    pose_c2w = jnp.asarray(pose_c2w, jnp.float32)
    intr = jnp.asarray(intrinsics, jnp.float32)
    x, y = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        jnp.arange(height, dtype=jnp.float32) + 0.5,
    )
    d = jnp.stack(
        [
            (x - intr[0, 2]) / intr[0, 0],
            (y - intr[1, 2]) / intr[1, 1],
            jnp.ones_like(x),
        ],
        axis=-1,
    ).reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirs = d @ pose_c2w[:3, :3].T
    origins = jnp.broadcast_to(pose_c2w[:3, 3], dirs.shape)
    return origins, dirs


def fisheye_rays(pose_c2w, intrinsics, width: int, height: int):
    """Equidistant fisheye (r_px = f * theta): the distorted-camera path
    the OptiX tracer exists for (threedgrut camera models). [H*W, 3] each;
    pixels beyond theta=pi/2+ get valid rays pointing sideways/backwards."""
    pose_c2w = jnp.asarray(pose_c2w, jnp.float32)
    intr = jnp.asarray(intrinsics, jnp.float32)
    x, y = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        jnp.arange(height, dtype=jnp.float32) + 0.5,
    )
    u = (x - intr[0, 2]) / intr[0, 0]
    v = (y - intr[1, 2]) / intr[1, 1]
    r = jnp.sqrt(u * u + v * v)
    theta = r  # equidistant: angle from optical axis = normalized radius
    sin_t = jnp.sin(theta)
    safe_r = jnp.maximum(r, 1e-9)
    d = jnp.stack(
        [sin_t * u / safe_r, sin_t * v / safe_r, jnp.cos(theta)], axis=-1
    ).reshape(-1, 3)
    dirs = d @ pose_c2w[:3, :3].T
    origins = jnp.broadcast_to(pose_c2w[:3, 3], dirs.shape)
    return origins, dirs


def trace_image(
    g: dict,
    pose_c2w,
    intrinsics,
    width: int,
    height: int,
    sh_degree: int = 3,
    camera: str = "pinhole",
    chunk: int = 4096,
    **kw,
):
    """Render a full image with the ray tracer. g holds gaussian arrays in
    the gom.py PLY convention (means/quats/log_scales/opacity_logits/
    features_dc/features_rest). Returns rgb/depth/alpha images (numpy)."""
    import numpy as np

    rays_o, rays_d = (
        pinhole_rays(pose_c2w, intrinsics, width, height)
        if camera == "pinhole"
        else fisheye_rays(pose_c2w, intrinsics, width, height)
    )
    means = jnp.asarray(g["means"], jnp.float32)
    quats = jnp.asarray(g["quats"], jnp.float32)
    quats = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    scales = jnp.exp(jnp.asarray(g["log_scales"], jnp.float32))
    opac = jax.nn.sigmoid(jnp.asarray(g["opacity_logits"], jnp.float32))
    sh = jnp.concatenate(
        [
            jnp.asarray(g["features_dc"], jnp.float32)[:, None, :],
            jnp.asarray(g["features_rest"], jnp.float32),
        ],
        axis=1,
    )
    n_rays = rays_o.shape[0]
    outs = {"rgb": [], "depth": [], "alpha": []}
    for i in range(0, n_rays, chunk):
        ro, rd = rays_o[i : i + chunk], rays_d[i : i + chunk]
        npad = (-ro.shape[0]) % chunk
        if npad:
            ro = jnp.concatenate([ro, jnp.zeros((npad, 3), ro.dtype)])
            rd = jnp.concatenate(
                [rd, jnp.tile(jnp.asarray([0.0, 0, 1]), (npad, 1))]
            )
        o = trace_gaussians(
            means, quats, scales, opac, sh, ro, rd,
            sh_degree=sh_degree, **kw,
        )
        take = min(chunk, n_rays - i)
        for key in outs:
            outs[key].append(np.asarray(o[key][:take]))
    return {
        "rgb": np.concatenate(outs["rgb"]).reshape(height, width, 3),
        "depth": np.concatenate(outs["depth"]).reshape(height, width),
        "alpha": np.concatenate(outs["alpha"]).reshape(height, width),
    }
