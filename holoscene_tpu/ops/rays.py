"""Camera ray generation and ray/volume intersection utilities.

Reference semantics: utils/rend_util.py:56-130 (get_camera_params / lift,
OpenCV pixel convention, c2w pose matrices) and
model/ray_sampler.py:48-60 (near_far_from_cube AABB slab test).
"""

from __future__ import annotations

import jax.numpy as jnp


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray):
    """Unproject pixel coords to camera space (homogeneous).

    x, y, z: [N]; intrinsics: [3+,3+] (row-major K). Returns [N, 4].
    """
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]
    sk = intrinsics[0, 1]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_rays(
    uv: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ray_offset: jnp.ndarray | None = None,
):
    """Perspective rays through pixel centers.

    uv:         [N, 2] pixel coordinates (x, y)
    pose:       [4, 4] camera-to-world
    intrinsics: [3+, 3+]
    ray_offset: optional [N, 2] jitter in pixels (training-time antialiasing,
                reference network.py:785)
    Returns (ray_dirs [N,3] unit-norm world, cam_loc [3], depth_scale [N,1]).

    depth_scale is the camera-frame z component of the *unnormalized-pose*
    ray directions; multiplying a rendered distance by it converts
    distance-along-ray to z-depth (reference network.py:791-792).
    """
    x = uv[:, 0]
    y = uv[:, 1]
    if ray_offset is not None:
        x = x + ray_offset[:, 0]
        y = y + ray_offset[:, 1]
    z = jnp.ones_like(x)
    pts_cam = lift(x, y, z, intrinsics)  # [N, 4]

    cam_loc = pose[:3, 3]
    world = (pose @ pts_cam.T).T  # [N, 4]
    world = world[:, :3] / world[:, 3:4]
    dirs = world - cam_loc[None, :]
    dirs_norm = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # camera-frame unit-ray z (identity pose): z=1 before normalization
    cam_dirs = pts_cam[:, :3]
    depth_scale = (cam_dirs / jnp.linalg.norm(cam_dirs, axis=-1, keepdims=True))[:, 2:3]
    return dirs_norm, cam_loc, depth_scale


def get_orthographic_rays(
    uv_unit: jnp.ndarray,
    pose: jnp.ndarray,
    half_extent: float,
):
    """Orthographic rays for object-centric Stage-2 renders.

    uv_unit: [N, 2] in [-1, 1] image plane coords; pose: [4,4] c2w;
    half_extent: half the orthographic frustum width in world units.
    Origin per ray lies on the camera plane, direction is camera +z.
    (Reference: utils/general.py:849-930 orthographic proj/rays.)
    """
    right = pose[:3, 0]
    up = pose[:3, 1]
    fwd = pose[:3, 2]
    center = pose[:3, 3]
    origins = (
        center[None, :]
        + uv_unit[:, 0:1] * half_extent * right[None, :]
        + uv_unit[:, 1:2] * half_extent * up[None, :]
    )
    dirs = jnp.broadcast_to(fwd[None, :], origins.shape)
    return origins, dirs


def near_far_from_cube(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bound: float,
    min_near: float = 0.0,
    max_far: float = 1e9,
):
    """AABB slab test against the cube [-bound, bound]^3.

    rays_o, rays_d: [N, 3]. Returns (near [N,1], far [N,1]); rays that miss
    get near=far=1e9 (reference ray_sampler.py:48-60).
    """
    tmin = (-bound - rays_o) / (rays_d + 1e-15)
    tmax = (bound - rays_o) / (rays_d + 1e-15)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    far = jnp.minimum(far, max_far)
    return near, far


def get_sphere_intersections(cam_loc: jnp.ndarray, ray_dirs: jnp.ndarray, r: float):
    """Ray-sphere intersection distances (both roots), clamped to >= 0."""
    dot = jnp.sum(ray_dirs * cam_loc[None, :], axis=-1, keepdims=True)
    under = dot ** 2 - (jnp.sum(cam_loc ** 2) - r ** 2)
    under = jnp.maximum(under, 0.0)
    sqrt_u = jnp.sqrt(under)
    return jnp.maximum(jnp.concatenate([-dot - sqrt_u, -dot + sqrt_u], axis=-1), 0.0)
