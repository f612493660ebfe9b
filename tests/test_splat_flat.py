"""Flat sorted-candidate splat pipeline (ops/splat_flat.py) vs brute force.

Ground truth here is EXACT per-pixel compositing over every gaussian in
true depth order — no tile truncation, no approximate top-K. This is the
oracle that adjudicates the flat-vs-topk parity question: the shipped
top-K path selects candidates with jax.lax.approx_max_k (recall ~0.95),
so it can MISS real front contributors; the flat path bins exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians
from holoscene_tpu.ops.splat import render_gaussians
from holoscene_tpu.ops.splat_flat import (
    FlatPlan,
    composite_tiles_flat,
    plan_flat,
)

INTERP = jax.default_backend() != "tpu"


def _scene(n=300, res=64, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
         rng.uniform(1.2, 3.0, n)], axis=-1,
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmat = jnp.eye(4)
    f = res * 0.8
    intr = jnp.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    return (jnp.asarray(means), jnp.asarray(q), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), viewmat, intr)


def _brute_force(xy, depth, conic, opac, valid, rgb, width, height):
    """Exact per-pixel front-to-back compositing over ALL gaussians."""
    xy, depth, conic, opac, valid, rgb = (
        np.asarray(z) for z in (xy, depth, conic, opac, valid, rgb))
    order = np.argsort(depth, kind="stable")
    xy, depth, conic, opac, valid, rgb = (
        z[order] for z in (xy, depth, conic, opac, valid, rgb))
    py, px = np.mgrid[0:height, 0:width]
    px = px.ravel() + 0.5
    py = py.ravel() + 0.5
    dx = px[:, None] - xy[None, :, 0]   # [P, N]
    dy = py[:, None] - xy[None, :, 1]
    power = -0.5 * (conic[None, :, 0] * dx * dx
                    + 2 * conic[None, :, 1] * dx * dy
                    + conic[None, :, 2] * dy * dy)
    a = np.minimum(0.999, (opac * valid)[None, :] * np.exp(
        np.minimum(power, 0.0)))
    a = np.where(a >= 1 / 255, a, 0.0)
    trans = np.cumprod(1 - a, axis=1)
    trans = np.concatenate([np.ones_like(trans[:, :1]), trans[:, :-1]], 1)
    w = a * trans
    out_rgb = (w[..., None] * rgb[None]).sum(1).reshape(height, width, 3)
    alpha = w.sum(1).reshape(height, width)
    d_acc = (w * depth[None]).sum(1).reshape(height, width)
    return out_rgb, d_acc / np.maximum(alpha, 1e-10), alpha


def test_flat_render_matches_bruteforce():
    means, quats, scales, opac, colors, viewmat, intr = _scene()
    res = 64
    cov3d = covariance_3d(quats, scales)
    xy, depth, conic, radius, valid = project_gaussians(
        means, cov3d, viewmat, intr, res, res)
    plan = plan_flat(xy, conic, opac, valid, res // 16, res // 16, 16)
    out = render_gaussians(
        means, quats, scales, opac, colors, viewmat, intr,
        width=res, height=res, tile_size=16, flat_plan=plan,
        use_pallas=not INTERP)
    ref_rgb, ref_depth, ref_alpha = _brute_force(
        xy, depth, conic, opac, valid, colors, res, res)

    np.testing.assert_allclose(np.asarray(out["rgb"]), ref_rgb, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)
    vis = ref_alpha > 0.1  # depth is alpha-normalized; empty pixels are 0/eps
    np.testing.assert_allclose(
        np.asarray(out["depth"])[vis], ref_depth[vis], atol=5e-3)


def test_flat_grad_matches_bruteforce_autodiff():
    means, quats, scales, opac, colors, viewmat, intr = _scene(n=120, seed=3)
    res = 32
    ts = 16
    cov3d = covariance_3d(quats, scales)
    xy, depth, conic, radius, valid = project_gaussians(
        means, cov3d, viewmat, intr, res, res)
    plan = plan_flat(xy, conic, opac, valid, res // ts, res // ts, ts)
    tgt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (res, res, 3)))

    tiles = res // ts

    def flat_loss(xy, depth, conic, opac, colors):
        rgb_t, depth_n, alpha_t, _ = composite_tiles_flat(
            xy, depth, conic, opac, colors, valid, res, res, ts, plan,
            interpret=INTERP)
        img = rgb_t.reshape(tiles, tiles, ts, ts, 3).swapaxes(1, 2)
        img = img.reshape(res, res, 3)
        a = alpha_t.reshape(tiles, tiles, ts, ts).swapaxes(1, 2)
        return jnp.mean((img - tgt) ** 2) + 0.1 * jnp.mean(a)

    def brute_loss(xy, depth, conic, opac, colors):
        order = jnp.argsort(depth)
        xo, do, co, oo, ro = (z[order] for z in
                              (xy, depth, conic, opac, colors))
        vo = valid[order]
        py, px = np.mgrid[0:res, 0:res]
        pxl = jnp.asarray(px.ravel() + 0.5)
        pyl = jnp.asarray(py.ravel() + 0.5)
        dx = pxl[:, None] - xo[None, :, 0]
        dy = pyl[:, None] - xo[None, :, 1]
        power = -0.5 * (co[None, :, 0] * dx * dx
                        + 2 * co[None, :, 1] * dx * dy
                        + co[None, :, 2] * dy * dy)
        a = jnp.minimum(0.999, (oo * vo)[None, :] * jnp.exp(
            jnp.minimum(power, 0.0)))
        a = jnp.where(a >= 1 / 255, a, 0.0)
        trans = jnp.cumprod(1 - a, axis=1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], 1)
        w = a * trans
        img = (w[..., None] * ro[None]).sum(1).reshape(res, res, 3)
        alpha = w.sum(1).reshape(res, res)
        return jnp.mean((img - tgt) ** 2) + 0.1 * jnp.mean(alpha)

    args = (xy, depth, conic, opac, colors)
    g_flat = jax.grad(flat_loss, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(brute_loss, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr, name in zip(g_flat, g_ref,
                            ("xy", "depth", "conic", "opac", "colors")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_flat_overflow_flag():
    means, quats, scales, opac, colors, viewmat, intr = _scene(n=200)
    res = 32
    cov3d = covariance_3d(quats, scales)
    xy, depth, conic, radius, valid = project_gaussians(
        means, cov3d, viewmat, intr, res, res)
    tiny = FlatPlan(span_x=2, span_y=2, c_max=128)  # way under capacity
    _, _, _, overflow = composite_tiles_flat(
        xy, depth, conic, opac, colors, valid, res, res, 16, tiny,
        interpret=INTERP)
    assert int(overflow) == 1
    good = plan_flat(xy, conic, opac, valid, 2, 2, 16)
    _, _, _, ok = composite_tiles_flat(
        xy, depth, conic, opac, colors, valid, res, res, 16, good,
        interpret=INTERP)
    assert int(ok) == 0


def test_flat_empty_tiles_render_zero():
    # all gaussians confined to the top-left corner; far tiles stay empty
    n, res, ts = 64, 64, 16
    rng = np.random.default_rng(5)
    means = np.stack(
        [rng.uniform(-0.55, -0.35, n), rng.uniform(-0.55, -0.35, n),
         rng.uniform(1.0, 1.4, n)], -1).astype(np.float32)
    scales = np.full((n, 3), 0.01, np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    opac = np.full(n, 0.9, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmat = jnp.eye(4)
    intr = jnp.array(
        [[res * 0.8, 0, res / 2], [0, res * 0.8, res / 2], [0, 0, 1.0]])
    cov3d = covariance_3d(jnp.asarray(quats), jnp.asarray(scales))
    xy, depth, conic, radius, valid = project_gaussians(
        jnp.asarray(means), cov3d, viewmat, intr, res, res)
    plan = plan_flat(xy, conic, jnp.asarray(opac), valid,
                     res // ts, res // ts, ts)
    out = render_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), viewmat, intr,
        width=res, height=res, tile_size=ts, flat_plan=plan,
        use_pallas=not INTERP)
    alpha = np.asarray(out["alpha"])
    assert alpha[: res // 2, : res // 2].max() > 0.5  # content corner
    assert alpha[res // 2:, res // 2:].max() == pytest.approx(0.0, abs=1e-6)
