"""Unscented-transform projection (ops/gaussians.project_gaussians_ut) —
the 3DGUT capability (distorted cameras + rolling shutter) of the
reference's CUDA rasterizer (threedgut_tracer/tracer.py:158-360), here as
sigma points through the full camera model feeding the same tile renderer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.gaussians import (
    camera_project,
    covariance_3d,
    project_gaussians,
    project_gaussians_ut,
    quat_to_rotmat,
)

W, H = 64, 48
INTR = jnp.asarray([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]])


def _gaussians(n=32, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.0
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = rng.uniform(0.5 * scale, scale, (n, 3)).astype(np.float32)
    return jnp.asarray(means), jnp.asarray(q), jnp.asarray(s)


def test_ut_matches_ewa_for_pinhole():
    """For small gaussians the UT of the pinhole projection equals the EWA
    linearization to first order: means a fraction of a pixel apart, conics
    within a few percent."""
    means, q, s = _gaussians()
    vm = jnp.eye(4)
    cov3d = covariance_3d(q, s)
    sqrt_cov = quat_to_rotmat(q) * s[..., None, :]

    xy_e, z_e, con_e, rad_e, ok_e = project_gaussians(
        means, cov3d, vm, INTR, W, H
    )
    xy_u, z_u, con_u, rad_u, ok_u = project_gaussians_ut(
        means, sqrt_cov, vm, INTR, W, H
    )
    np.testing.assert_allclose(np.asarray(z_u), np.asarray(z_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xy_u), np.asarray(xy_e), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(con_u), np.asarray(con_e), rtol=0.08, atol=0.02
    )
    assert bool(jnp.all(ok_u == ok_e))


def test_camera_project_models():
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.4, -0.2, 2.0]])
    pin = camera_project(pts, INTR, "pinhole")
    # zero-distortion opencv == pinhole exactly
    ocv0 = camera_project(pts, INTR, "opencv", dist=(0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(ocv0), np.asarray(pin), atol=1e-5)
    # principal axis is a fixed point of every model
    fe = camera_project(pts[:1], INTR, "fisheye")
    np.testing.assert_allclose(np.asarray(fe[0]), [32.0, 24.0], atol=1e-3)
    # positive k1 pushes points outward (barrel -> pincushion sign conv.)
    ocv = camera_project(pts[1:], INTR, "opencv", dist=(0.2, 0.0, 0.0, 0.0))
    d0 = np.linalg.norm(np.asarray(pin[1]) - [32, 24])
    d1 = np.linalg.norm(np.asarray(ocv[0]) - [32, 24])
    assert d1 > d0
    # fisheye compresses off-axis points vs pinhole (r = f*atan(r) < f*r)
    fe1 = camera_project(pts[1:], INTR, "fisheye")
    d2 = np.linalg.norm(np.asarray(fe1[0]) - [32, 24])
    assert d2 < d0


def test_ut_distortion_shifts_offcenter_only():
    means, q, s = _gaussians()
    sqrt_cov = quat_to_rotmat(q) * s[..., None, :]
    vm = jnp.eye(4)
    xy_p, *_ = project_gaussians_ut(means, sqrt_cov, vm, INTR, W, H)
    xy_d, *_ = project_gaussians_ut(
        means, sqrt_cov, vm, INTR, W, H,
        camera_model="opencv", dist=(0.15, 0.02, 0.0, 0.0),
    )
    r_p = np.linalg.norm(np.asarray(xy_p) - [32, 24], axis=1)
    shift = np.linalg.norm(np.asarray(xy_d) - np.asarray(xy_p), axis=1)
    # near-center gaussians barely move; far ones move outward measurably
    near_shift = shift[np.argmin(r_p)]
    far_shift = shift[np.argmax(r_p)]
    assert near_shift < 0.35
    assert far_shift > max(0.3, 3.0 * near_shift)


def test_rolling_shutter_degenerate_and_motion():
    means, q, s = _gaussians()
    sqrt_cov = quat_to_rotmat(q) * s[..., None, :]
    vm = jnp.eye(4)
    xy0, z0, c0, r0, ok0 = project_gaussians_ut(
        means, sqrt_cov, vm, INTR, W, H
    )
    # viewmat_end == viewmat -> identical to the static projection
    xy1, z1, c1, r1, ok1 = project_gaussians_ut(
        means, sqrt_cov, vm, INTR, W, H, viewmat_end=vm
    )
    np.testing.assert_allclose(np.asarray(xy1), np.asarray(xy0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-6)

    # camera translating +x during readout: bottom-row gaussians shift
    # opposite (-x in pixels) more than top-row ones
    vm_end = vm.at[0, 3].add(-0.2)  # world->cam translation
    xy2, *_ = project_gaussians_ut(
        means, sqrt_cov, vm, INTR, W, H, viewmat_end=vm_end
    )
    dx = np.asarray(xy2[:, 0] - xy0[:, 0])
    rows = np.asarray(xy0[:, 1])
    top = dx[rows < np.median(rows)]
    bot = dx[rows >= np.median(rows)]
    assert np.abs(bot).mean() > np.abs(top).mean()


def test_render_gaussians_ut_camera_trains():
    from holoscene_tpu.ops.splat import render_gaussians

    means, q, s = _gaussians(64, seed=2, scale=0.05)
    opac = jnp.full((64,), 0.8)
    cols = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (64, 3)),
                       jnp.float32)
    vm = jnp.eye(4)

    def loss(m):
        out = render_gaussians(
            m, q, s, opac, cols, vm, INTR, width=W, height=H,
            max_per_tile=64, use_pallas=False,
            camera_model="fisheye", dist=(0.01, 0.0, 0.0, 0.0),
            viewmat_end=vm.at[0, 3].add(-0.05),
        )
        assert out["rgb"].shape == (H, W, 3)
        return (out["rgb"] ** 2).mean()

    val, g = jax.value_and_grad(loss)(means)
    assert np.isfinite(float(val)) and float(val) > 0
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0
