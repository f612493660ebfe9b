"""SE(3) camera-pose refinement layer.


Reference semantics: model/cam_opt.py:13-110 — a per-image 6-DoF delta
(rotation-vector + translation) applied to camera-to-world poses via the
SO(3)xR(3) exponential map. Defined-but-unwired in the reference; here it is
a small functional module any stage runner can enable.
"""

from __future__ import annotations


import jax.numpy as jnp


def exp_map_so3xr3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (translation, rotation-vector) -> [..., 3, 4] transforms
    (reference exp_map_SO3xR3, model/cam_opt.py:13)."""
    t = tangent[..., :3]
    omega = tangent[..., 3:]
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta_sq < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))

    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    k = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    sin_t = jnp.where(small[..., None], 1.0 - theta_sq[..., None] / 6.0,
                      jnp.sin(theta[..., None]) / theta[..., None])
    cos_t = jnp.where(small[..., None], 0.5 - theta_sq[..., None] / 24.0,
                      (1.0 - jnp.cos(theta[..., None])) / theta_sq[..., None])
    rot = eye + sin_t * k + cos_t * (k @ k)
    return jnp.concatenate([rot, t[..., :, None]], axis=-1)


def init_camera_optimizer(num_cameras: int) -> dict:
    return {"pose_deltas": jnp.zeros((num_cameras, 6), dtype=jnp.float32)}


def apply_camera_optimizer(params: dict, pose_c2w: jnp.ndarray,
                           camera_idx) -> jnp.ndarray:
    """Compose the learned delta with a c2w pose (reference CameraOptimizer
    forward, model/cam_opt.py:99)."""
    delta = exp_map_so3xr3(params["pose_deltas"][camera_idx])  # [3,4]
    rot = delta[..., :3, :3] @ pose_c2w[:3, :3]
    trans = delta[..., :3, :3] @ pose_c2w[:3, 3] + delta[..., :3, 3]
    return (
        jnp.eye(4, dtype=pose_c2w.dtype)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(trans)
    )


def pose_delta_regularizer(params: dict, trans_weight: float = 1e-2,
                           rot_weight: float = 1e-3) -> jnp.ndarray:
    d = params["pose_deltas"]
    return trans_weight * jnp.mean(d[:, :3] ** 2) + rot_weight * jnp.mean(
        d[:, 3:] ** 2
    )
