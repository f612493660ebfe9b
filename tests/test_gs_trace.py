"""Gaussian ray tracer (3DGRT TPU analog, ops/gs_trace.py) — hit math,
occlusion ordering, rasterizer parity, distorted cameras, gradients."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.ops.gs_trace import (
    fisheye_rays,
    pinhole_rays,
    trace_gaussians,
    trace_image,
)

SH_C0 = 0.28209479177387814


def _sh_from_rgb(rgb, degree=0):
    """[N,3] base color -> [N,B,3] SH coeffs whose degree-0 eval equals it."""
    n = len(rgb)
    b = (degree + 1) ** 2
    sh = np.zeros((n, b, 3), np.float32)
    sh[:, 0] = (np.asarray(rgb) - 0.5) / SH_C0
    return sh


def test_single_gaussian_through_center():
    """A ray through a gaussian's center: max response = 1, alpha = opacity,
    depth = distance to the center (gaussianParticles.cuh processHit)."""
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)
    opac = jnp.asarray([0.7])
    sh = jnp.asarray(_sh_from_rgb([[1.0, 0.5, 0.25]]))
    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = trace_gaussians(
        means, quats, scales, opac, sh, rays_o, rays_d,
        sh_degree=0, max_hits=1,
    )
    assert out["alpha"][0] == pytest.approx(0.7, abs=1e-5)
    assert out["depth"][0] == pytest.approx(2.0 * 0.7, abs=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0]), 0.7 * np.asarray([1.0, 0.5, 0.25]),
        atol=1e-4,
    )


def test_offset_ray_response_falls_off():
    """Response at perpendicular offset r from the center of an isotropic
    gaussian (scale s) is exp(-r^2 / (2 s^2))."""
    s, r_off = 0.2, 0.3
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), s)
    opac = jnp.asarray([1.0])
    sh = jnp.asarray(_sh_from_rgb([[1.0, 1.0, 1.0]]))
    rays_o = jnp.asarray([[r_off, 0.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = trace_gaussians(
        means, quats, scales, opac, sh, rays_o, rays_d,
        sh_degree=0, max_hits=1,
    )
    expect = min(0.99, np.exp(-(r_off**2) / (2 * s**2)))
    assert out["alpha"][0] == pytest.approx(expect, rel=1e-4)


def test_anisotropic_rotation_respected():
    """A gaussian elongated along x then rotated 90deg about z must respond
    along y instead."""
    # scale: long x, thin y/z ; rotate +90deg about z -> long axis now y
    ang = np.pi / 2
    quats = jnp.asarray([[np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)]])
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    scales = jnp.asarray([[0.5, 0.02, 0.02]])
    opac = jnp.asarray([1.0])
    sh = jnp.asarray(_sh_from_rgb([[1.0, 1.0, 1.0]]))
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    rays_o = jnp.asarray([[0.3, 0.0, 0.0], [0.0, 0.3, 0.0]])
    out = trace_gaussians(
        means, quats, scales, opac, sh, rays_o, rays_d,
        sh_degree=0, max_hits=1,
    )
    a = np.asarray(out["alpha"])
    assert a[1] > 0.5          # along the rotated long axis: strong hit
    assert a[0] < 1e-3         # along the now-thin axis: no hit


def test_occlusion_ordering():
    """Two gaussians on one ray: the NEARER one must dominate the color
    regardless of storage order."""
    for order in ([0, 1], [1, 0]):
        means = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 3.0]])[jnp.asarray(order)]
        cols = np.asarray([[1.0, 0, 0], [0, 1.0, 0]])[order]  # near=red
        quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
        scales = jnp.full((2, 3), 0.1)
        opac = jnp.asarray([0.95, 0.95])
        sh = jnp.asarray(_sh_from_rgb(cols))
        out = trace_gaussians(
            means, quats, scales, opac, sh,
            jnp.zeros((1, 3)), jnp.asarray([[0.0, 0, 1.0]]),
            sh_degree=0, max_hits=8,
        )
        rgb = np.asarray(out["rgb"][0])
        assert rgb[0] > 0.9 and rgb[1] < 0.1  # red (near) wins


def test_streaming_topk_crosses_blocks():
    """Particles scattered across many scan blocks must all be found: fill
    several blocks with far decoys and put the true nearest hit in the last
    block."""
    n = 700  # > 2 blocks at block=256
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.uniform(-0.2, 0.2, (n - 1, 2)), np.full((n - 1, 1), 50.0)],
        axis=1,
    )
    means = np.vstack([means, [[0.0, 0.0, 2.0]]]).astype(np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = np.full((n, 3), 0.1, np.float32)
    opac = np.full((n,), 0.9, np.float32)
    cols = np.zeros((n, 3)); cols[-1] = [0, 0, 1.0]
    sh = _sh_from_rgb(cols)
    out = trace_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh),
        jnp.zeros((1, 3)), jnp.asarray([[0.0, 0, 1.0]]),
        sh_degree=0, max_hits=16, block=256,
    )
    rgb = np.asarray(out["rgb"][0])
    assert rgb[2] > 0.8  # the blue near gaussian from the last block won
    # expected depth is alpha-weighted; the near hit dominates
    assert np.asarray(out["depth"][0]) < 10.0


def test_parity_with_rasterizer():
    """Tracer and tile rasterizer render the same random cloud from the
    same pinhole camera: images must agree closely (both are exact
    per-gaussian compositors; only hit truncation differs)."""
    from holoscene_tpu.ops.splat import render_gaussians

    rng = np.random.default_rng(1)
    n = 80
    means = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.5, (n, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    sh = _sh_from_rgb(cols)
    res = 48
    intr = np.array([[40.0, 0, res / 2], [0, 40.0, res / 2], [0, 0, 1]],
                    np.float32)

    img_r = render_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.eye(4), jnp.asarray(intr),
        res, res, sh_degree=0, max_per_tile=128, use_pallas=False,
    )
    g = {
        "means": means, "quats": quats,
        "log_scales": np.log(scales),
        "opacity_logits": np.log(opac / (1 - opac)),
        "features_dc": cols, "features_rest": np.zeros((n, 0, 3), np.float32),
    }
    img_t = trace_image(g, np.eye(4), intr, res, res, sh_degree=0,
                        max_hits=64)
    a = np.asarray(img_r["rgb"])
    b = img_t["rgb"]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # EWA projection (rasterizer) vs exact 3D response (tracer) differ by
    # design in the falloff tails; the images must still match closely
    assert psnr > 24.0, f"tracer/rasterizer parity psnr={psnr:.1f}"


def test_fisheye_rays_geometry():
    """Center pixel looks along the optical axis; a pixel f*(pi/2) away
    looks perpendicular to it (equidistant model r = f*theta)."""
    res, f = 65, 20.0
    intr = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1]], np.float32)
    o, d = fisheye_rays(np.eye(4), intr, res, res)
    d = np.asarray(d).reshape(res, res, 3)
    center = d[res // 2, res // 2]
    np.testing.assert_allclose(center, [0, 0, 1], atol=0.03)
    # pixel at x-offset f*pi/2: ray along +x
    px = int(res / 2 + f * np.pi / 2)
    side = d[res // 2, px]
    assert side[0] > 0.95
    np.testing.assert_allclose(
        np.linalg.norm(d, axis=-1), 1.0, atol=1e-5
    )


def test_fisheye_render_finite_and_wide():
    """A fisheye trace sees gaussians far off the pinhole frustum axis."""
    # gaussian at 80 degrees off-axis — far outside a normal pinhole FOV
    ang = np.deg2rad(80.0)
    means = np.asarray([[np.sin(ang) * 2, 0.0, np.cos(ang) * 2]], np.float32)
    g = {
        "means": means,
        "quats": np.asarray([[1.0, 0, 0, 0]], np.float32),
        "log_scales": np.log(np.full((1, 3), 0.2, np.float32)),
        "opacity_logits": np.asarray([3.0], np.float32),
        "features_dc": np.asarray([[1.0, 0, 0]], np.float32),
        "features_rest": np.zeros((1, 0, 3), np.float32),
    }
    res = 64
    f = res / np.pi  # equidistant: theta=pi/2 at the image edge
    intr = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1]], np.float32)
    img = trace_image(g, np.eye(4), intr, res, res, sh_degree=0, max_hits=4,
                      camera="fisheye")
    assert np.isfinite(img["rgb"]).all()
    assert img["alpha"].max() > 0.5  # the off-axis gaussian is visible
    # and a pinhole with a normal FOV does NOT see it
    intr_pin = np.array(
        [[res, 0, res / 2], [0, res, res / 2], [0, 0, 1]], np.float32
    )
    img_pin = trace_image(g, np.eye(4), intr_pin, res, res, sh_degree=0,
                          max_hits=4)
    assert img_pin["alpha"].max() < 1e-3


def test_gradients_flow_and_finite():
    """d(loss)/d(means, scales, opacity, sh) exists and is finite — the
    tracer is trainable like the reference's autograd tracer."""
    rng = np.random.default_rng(2)
    n = 16
    means = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.3, 0.3, (n, 2)), rng.uniform(1.5, 2.5, (n, 1))],
            axis=1,
        ),
        jnp.float32,
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.full((n, 3), 0.15)
    opac = jnp.full((n,), 0.6)
    sh = jnp.asarray(_sh_from_rgb(rng.uniform(0, 1, (n, 3))))
    rays_o = jnp.zeros((8, 3))
    phi = jnp.linspace(-0.2, 0.2, 8)
    rays_d = jnp.stack(
        [jnp.sin(phi), jnp.zeros(8), jnp.cos(phi)], axis=-1
    )

    def loss(m, s, o, c):
        out = trace_gaussians(
            m, quats, s, o, c, rays_o, rays_d, sh_degree=0, max_hits=8
        )
        return (out["rgb"].sum() + out["depth"].sum())

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, sh)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
    assert any(float(jnp.abs(gr).max()) > 0 for gr in grads)


def test_normals_output():
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)
    opac = jnp.asarray([0.9])
    sh = jnp.asarray(_sh_from_rgb([[1.0, 1, 1]]))
    out = trace_gaussians(
        means, quats, scales, opac, sh,
        jnp.zeros((1, 3)), jnp.asarray([[0.0, 0, 1.0]]),
        sh_degree=0, max_hits=1, with_normal=True,
    )
    nrm = np.asarray(out["normal"][0])
    assert np.isfinite(nrm).all()
    # head-on hit: surface normal points back toward the origin (-z)
    assert nrm[2] < 0
