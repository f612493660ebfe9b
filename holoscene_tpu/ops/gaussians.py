"""3D Gaussian math: quaternions, covariances, EWA projection, spherical
harmonics.

Reference counterparts: pytorch3d quaternion ops used by model/gom.py:54-64
(quaternion_multiply, axis_angle_to_quaternion, matrix_to_quaternion) and
gsplat's projection math (model/gom.py:1120 rasterization inputs).
Conventions match pytorch3d: quaternions are (w, x, y, z), rotation matrices
are world-from-local with COLUMNS as local axes.
"""

from __future__ import annotations

import jax.numpy as jnp

# SH constants (standard real SH basis, degree 0..3)
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (w,x,y,z)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def axis_angle_to_quat(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[...,3] rotation vector -> (w,x,y,z) quaternion.

    NaN-free gradients at zero rotation: the norm is computed through a
    guarded sqrt and the small-angle branch uses a polynomial in |v|^2
    (jnp.linalg.norm's gradient at 0 is NaN, and zero IS the init state of
    the GoM spin/tilt parameters)."""
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < 1e-12
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    # sin(angle/2)/angle, Taylor for small angles: 1/2 - angle^2/48
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, axis_angle * k], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z) [...,4] -> [...,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[...,3,3] -> (w,x,y,z), branch-free (Shepperd's method via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    qw = jnp.sqrt(jnp.maximum(0.0, 1 + m00 + m11 + m22)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def covariance_3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """[N,4],[N,3] -> [N,3,3] covariance R diag(s^2) R^T."""
    rot = quat_to_rotmat(quats)
    m = rot * scales[..., None, :]
    return m @ jnp.swapaxes(m, -1, -2)


def project_gaussians_fused(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    width: int,
    height: int,
    near: float = 0.01,
    blur: float = 0.3,
    ortho: bool = False,
):
    """EWA projection in scalar-channel (structure-of-arrays) form: every
    intermediate is a flat [N] vector, so nothing pays the 128-lane pad
    that [N,3,3]/[N,2,3] minor-dim tensors do on TPU (the r5g attribution
    measured the einsum formulation's fwd+bwd at 8.2 ms for 100k gaussians
    — dominated by padded layout traffic, not flops). Same math and same
    returns as covariance_3d + project_gaussians (parity-tested, fwd and
    grad); the backward differentiates pure [N] elementwise ops.
    """
    # camera-frame means: 3 fused dot products against the constant 3x4
    r = viewmat[:3, :3]
    t = viewmat[:3, 3]
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    x = r[0, 0] * mx + r[0, 1] * my + r[0, 2] * mz + t[0]
    y = r[1, 0] * mx + r[1, 1] * my + r[1, 2] * mz + t[1]
    z = r[2, 0] * mx + r[2, 1] * my + r[2, 2] * mz + t[2]
    valid = z > near
    zc = jnp.maximum(z, near)

    # rotation entries as [N] scalars (normalized quats)
    qn = jnp.sqrt(quats[:, 0] ** 2 + quats[:, 1] ** 2
                  + quats[:, 2] ** 2 + quats[:, 3] ** 2)
    qw, qx, qy, qz = (quats[:, 0] / qn, quats[:, 1] / qn,
                      quats[:, 2] / qn, quats[:, 3] / qn)
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0sq = scales[:, 0] ** 2
    s1sq = scales[:, 1] ** 2
    s2sq = scales[:, 2] ** 2

    # camera-frame row vectors a_i = R_cam[i,:] @ R_gauss (per-axis [N])
    def cam_row(i):
        return (r[i, 0] * r00 + r[i, 1] * r10 + r[i, 2] * r20,
                r[i, 0] * r01 + r[i, 1] * r11 + r[i, 2] * r21,
                r[i, 0] * r02 + r[i, 1] * r12 + r[i, 2] * r22)

    a0 = cam_row(0)
    a1 = cam_row(1)
    a2 = cam_row(2)

    # w_ij = a_i diag(s^2) a_j  (camera-frame 3D covariance entries)
    def wcov(ai, aj):
        return ai[0] * aj[0] * s0sq + ai[1] * aj[1] * s1sq \
            + ai[2] * aj[2] * s2sq

    w00 = wcov(a0, a0)
    w01 = wcov(a0, a1)
    w02 = wcov(a0, a2)
    w11 = wcov(a1, a1)
    w12 = wcov(a1, a2)
    w22 = wcov(a2, a2)

    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    if ortho:
        # J = [[fx,0,0],[0,fy,0]]
        ca = fx * fx * w00 + blur
        cb = fx * fy * w01
        cc = fy * fy * w11 + blur
        px = fx * x + cx
        py = fy * y + cy
    else:
        lim_x = 1.3 * (width / (2 * fx))
        lim_y = 1.3 * (height / (2 * fy))
        tx = jnp.clip(x / zc, -lim_x, lim_x) * zc
        ty = jnp.clip(y / zc, -lim_y, lim_y) * zc
        j00 = fx / zc
        j02 = -fx * tx / (zc * zc)
        j11 = fy / zc
        j12 = -fy * ty / (zc * zc)
        # cov2d = J W J^T with J = [[j00,0,j02],[0,j11,j12]]
        ca = (j00 * j00 * w00 + 2 * j00 * j02 * w02
              + j02 * j02 * w22) + blur
        cb = (j00 * j11 * w01 + j00 * j12 * w02
              + j02 * j11 * w12 + j02 * j12 * w22)
        cc = (j11 * j11 * w11 + 2 * j11 * j12 * w12
              + j12 * j12 * w22) + blur
        px = fx * x / zc + cx
        py = fy * y / zc + cy

    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    conic = jnp.stack([cc / det, -cb / det, ca / det], axis=-1)
    mid = 0.5 * (ca + cc)
    eig = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 1e-12))
    radius = jnp.ceil(3.0 * jnp.sqrt(eig))
    on_screen = (
        (px + radius > 0) & (px - radius < width)
        & (py + radius > 0) & (py - radius < height)
    )
    xy = jnp.stack([px, py], axis=-1)
    return xy, z, conic, radius, valid & (z > near) & on_screen


def project_gaussians(
    means: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    width: int,
    height: int,
    near: float = 0.01,
    blur: float = 0.3,
    ortho: bool = False,
):
    """EWA splatting projection (gsplat classic mode; `ortho=True` matches
    gsplat's camera_model="ortho", where intrinsics hold pixels-per-world-
    unit scales — used for Stage-2/4 orthographic object views).

    Returns (xy [N,2] pixel centers, depth [N], conic [N,3] upper-tri of
    inverse cov2d, radius [N] 3-sigma px, valid [N]).
    """
    r = viewmat[:3, :3]
    t = viewmat[:3, 3]
    cam = means @ r.T + t
    z = cam[:, 2]
    valid = z > near
    zc = jnp.maximum(z, near)

    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = cam[:, 0]
    y = cam[:, 1]
    zero = jnp.zeros_like(zc)
    if ortho:
        one = jnp.ones_like(zc)
        j = jnp.stack(
            [
                jnp.stack([fx * one, zero, zero], -1),
                jnp.stack([zero, fy * one, zero], -1),
            ],
            axis=-2,
        )
    else:
        # clamp the tangent-plane extent like gsplat to stabilize J off-screen
        lim_x = 1.3 * (width / (2 * fx))
        lim_y = 1.3 * (height / (2 * fy))
        tx = jnp.clip(x / zc, -lim_x, lim_x) * zc
        ty = jnp.clip(y / zc, -lim_y, lim_y) * zc

        # J of (fx x/z, fy y/z): [N, 2, 3]
        j = jnp.stack(
            [
                jnp.stack([fx / zc, zero, -fx * tx / zc ** 2], -1),
                jnp.stack([zero, fy / zc, -fy * ty / zc ** 2], -1),
            ],
            axis=-2,
        )
    w_cov = r @ cov3d @ r.T if cov3d.ndim == 2 else jnp.einsum(
        "ij,njk,lk->nil", r, cov3d, r
    )
    cov2d = jnp.einsum("nij,njk,nlk->nil", j, w_cov, j)
    cov2d = cov2d + blur * jnp.eye(2)

    if ortho:
        xy = jnp.stack([fx * x + cx, fy * y + cy], axis=-1)
    else:
        xy = jnp.stack([fx * x / zc + cx, fy * y / zc + cy], axis=-1)
    conic, radius, ok = _finalize_cov2d(xy, z, cov2d, width, height, near)
    return xy, z, conic, radius, valid & ok


def _finalize_cov2d(xy, z, cov2d, width, height, near):
    """Shared projection tail: conic / 3-sigma radius / validity from a
    projected mean + 2D covariance (same math as project_gaussians)."""
    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack([c / det, -b / det, a / det], axis=-1)
    mid = 0.5 * (a + c)
    eig = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 1e-12))
    radius = jnp.ceil(3.0 * jnp.sqrt(eig))
    on_screen = (
        (xy[:, 0] + radius > 0)
        & (xy[:, 0] - radius < width)
        & (xy[:, 1] + radius > 0)
        & (xy[:, 1] - radius < height)
    )
    return conic, radius, (z > near) & on_screen


def camera_project(cam, intrinsics, camera_model: str = "pinhole",
                   dist=None, near: float = 0.01):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] under the
    nonlinear camera models the reference's 3DGUT rasterizer supports
    (threedgut_tracer: OpenCV pinhole distortion, equidistant fisheye).

    camera_model:
      pinhole — fx x/z + cx
      opencv  — radial k1,k2[,k3] + tangential p1,p2 on the normalized
                plane (dist = (k1, k2, p1, p2[, k3]))
      fisheye — equidistant r_px = f * theta_d with the OpenCV theta
                polynomial (dist = (k1, k2, k3, k4)); matches
                ops/gs_trace.fisheye_rays for dist = 0
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    zc = jnp.maximum(z, near)
    u, v = x / zc, y / zc
    if camera_model == "pinhole":
        return jnp.stack([fx * u + cx, fy * v + cy], axis=-1)
    if camera_model == "opencv":
        k1, k2, p1, p2 = (dist + (0.0,) * 4)[:4] if dist else (0.0,) * 4
        k3 = dist[4] if dist and len(dist) > 4 else 0.0
        r2 = u * u + v * v
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        ud = u * rad + 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
        vd = v * rad + p1 * (r2 + 2 * v * v) + 2 * p2 * u * v
        return jnp.stack([fx * ud + cx, fy * vd + cy], axis=-1)
    assert camera_model == "fisheye", camera_model
    k = tuple(dist) + (0.0,) * 4 if dist else (0.0,) * 4
    r = jnp.sqrt(jnp.maximum(u * u + v * v, 1e-12))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
    scale = theta_d / r
    return jnp.stack([fx * u * scale + cx, fy * v * scale + cy], axis=-1)


def project_gaussians_ut(
    means: jnp.ndarray,
    sqrt_cov: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    width: int,
    height: int,
    near: float = 0.01,
    blur: float = 0.3,
    camera_model: str = "pinhole",
    dist=None,
    viewmat_end: jnp.ndarray | None = None,
):
    """Unscented-transform projection (the reference 3DGUT rasterizer's
    core idea, threedgut_tracer/tracer.py:158-360): push 2n+1 sigma points
    of each 3D gaussian through the FULL nonlinear camera model instead of
    linearizing (EWA), which makes distorted cameras and rolling shutter
    exact to second order.

    sqrt_cov [N,3,3] is a factor M with cov3d = M M^T (for 3DGS params use
    R diag(s), i.e. `quat_to_rotmat(quats) * scales[..., None, :]` — no
    cholesky needed). UT weights: alpha=1, beta=2, kappa=0 -> lambda=0,
    the 6 offset points carry weight 1/6 each, the center point 0.

    viewmat_end enables linear rolling shutter: the effective pose for a
    gaussian is blended between viewmat (row 0) and viewmat_end (last row)
    by its projected row, resolved with two fixed-point iterations.

    Returns (xy, depth, conic, radius, valid) like project_gaussians.
    """
    n = means.shape[0]
    offs = jnp.sqrt(3.0) * jnp.swapaxes(sqrt_cov, -1, -2)  # rows = scaled cols
    pts = jnp.concatenate(
        [means[:, None, :] + offs, means[:, None, :] - offs], axis=1
    )  # [N,6,3]

    def to_cam(p, vm):
        return p @ vm[:3, :3].T + vm[:3, 3]

    cam_c = to_cam(means, viewmat)  # center (start pose)
    cam_s = to_cam(pts, viewmat)
    if viewmat_end is not None:
        cam_c_e = to_cam(means, viewmat_end)
        cam_s_e = to_cam(pts, viewmat_end)
        # 2 fixed-point iterations: project with t, reread the row
        t = jnp.full((n, 1), 0.5)
        for _ in range(2):
            blend_c = (1 - t) * cam_c + t * cam_c_e
            rowpix = camera_project(blend_c, intrinsics, camera_model, dist,
                                    near)[:, 1]
            t = jnp.clip(rowpix / max(height - 1, 1), 0.0, 1.0)[:, None]
        cam_c = (1 - t) * cam_c + t * cam_c_e
        cam_s = (1 - t[:, :, None]) * cam_s + t[:, :, None] * cam_s_e

    p2 = camera_project(cam_s, intrinsics, camera_model, dist, near)  # [N,6,2]
    xy = p2.mean(axis=1)  # w_i = 1/6 each
    d = p2 - xy[:, None, :]
    cov2d = jnp.einsum("nki,nkj->nij", d, d) / 6.0 + blur * jnp.eye(2)

    z = cam_c[:, 2]
    conic, radius, ok = _finalize_cov2d(xy, z, cov2d, width, height, near)
    # every sigma point must be in front of the camera for the UT to be
    # meaningful (matches 3DGUT's frustum gating)
    ok = ok & jnp.all(cam_s[..., 2] > near, axis=1)
    return xy, z, conic, radius, ok


def eval_sh(sh_coeffs: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """sh_coeffs [N, B, 3], dirs [N, 3] unit -> rgb [N, 3] (+0.5 offset,
    standard 3DGS convention)."""
    result = SH_C0 * sh_coeffs[:, 0]
    if degree >= 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        result = (
            result
            - SH_C1 * y * sh_coeffs[:, 1]
            + SH_C1 * z * sh_coeffs[:, 2]
            - SH_C1 * x * sh_coeffs[:, 3]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + SH_C2[0] * xy * sh_coeffs[:, 4]
            + SH_C2[1] * yz * sh_coeffs[:, 5]
            + SH_C2[2] * (2 * zz - xx - yy) * sh_coeffs[:, 6]
            + SH_C2[3] * xz * sh_coeffs[:, 7]
            + SH_C2[4] * (xx - yy) * sh_coeffs[:, 8]
        )
    if degree >= 3:
        result = (
            result
            + SH_C3[0] * y * (3 * xx - yy) * sh_coeffs[:, 9]
            + SH_C3[1] * xy * z * sh_coeffs[:, 10]
            + SH_C3[2] * y * (4 * zz - xx - yy) * sh_coeffs[:, 11]
            + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh_coeffs[:, 12]
            + SH_C3[4] * x * (4 * zz - xx - yy) * sh_coeffs[:, 13]
            + SH_C3[5] * z * (xx - yy) * sh_coeffs[:, 14]
            + SH_C3[6] * x * (xx - 3 * yy) * sh_coeffs[:, 15]
        )
    return result + 0.5
