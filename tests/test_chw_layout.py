"""Channels-major (CHW) render/loss layout parity: the chw=True paths must
be bit-compatible with the HWC defaults — only the layout changes
(ops/splat._image_epilogue, ops/ssim.ssim_chw, models/gom chw plumbing)."""

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_splat_scene
from holoscene_tpu.ops.splat import render_gaussians
from holoscene_tpu.ops.ssim import ssim, ssim_chw


def test_ssim_chw_matches_hwc():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (48, 40, 3)).astype(np.float32))
    b = jnp.clip(a + 0.05 * jnp.asarray(
        rng.normal(size=(48, 40, 3)).astype(np.float32)), 0, 1)
    s_hwc = float(ssim(a, b))
    s_chw = float(ssim_chw(a.transpose(2, 0, 1), b.transpose(2, 0, 1)))
    np.testing.assert_allclose(s_chw, s_hwc, rtol=1e-6)


def test_render_gaussians_chw_matches_hwc():
    params, quats, viewmat, intr, _ = make_splat_scene(n=2000, res=64)
    kw = dict(width=64, height=64, tile_size=16, max_per_tile=64,
              background=jnp.array([0.2, 0.3, 0.4]))
    args = (params["means"], quats, jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opac"]), params["colors"], viewmat, intr)
    out = render_gaussians(*args, **kw)
    out_c = render_gaussians(*args, chw=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out_c["rgb"]),
        np.asarray(out["rgb"]).transpose(2, 0, 1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_c["alpha"]),
                               np.asarray(out["alpha"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_c["depth"]),
                               np.asarray(out["depth"]), atol=1e-6)


def test_render_gaussians_chw_matches_hwc_flat():
    from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians
    from holoscene_tpu.ops.splat_flat import plan_flat

    params, quats, viewmat, intr, _ = make_splat_scene(n=2000, res=64)
    cov3d = covariance_3d(quats, jnp.exp(params["scales"]))
    xy, _, conic, _, valid = project_gaussians(
        params["means"], cov3d, viewmat, intr, 64, 64)
    plan = plan_flat(xy, conic, jax.nn.sigmoid(params["opac"]), valid,
                     4, 4, 16)
    kw = dict(width=64, height=64, tile_size=16, flat_plan=plan,
              background=jnp.array([0.1, 0.0, 0.9]))
    args = (params["means"], quats, jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opac"]), params["colors"], viewmat, intr)
    out = render_gaussians(*args, **kw)
    out_c = render_gaussians(*args, chw=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out_c["rgb"]),
        np.asarray(out["rgb"]).transpose(2, 0, 1), atol=1e-6)
    # flat-path flags survive the chw epilogue
    assert "used_chunks" in out_c and "stale" in out_c
