"""Stage-4 data parallelism: the dp-B sharded step must match a
single-device grad-mean over the same B-frame minibatch (parallel/stage4_dp).
Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.models.gom import (
    GoMConfig,
    gom_flat_bins,
    gom_loss,
    gom_scales,
    init_gom_params,
    render_gom,
    seed_gaussians_from_meshes,
)
from holoscene_tpu.parallel.stage4_dp import make_stage4_dp_step
from tests.test_stage4 import _gt_meshes


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("s4dp")
    generate_scene(str(root / "scene_0"), n_images=4, img_res=(32, 32))
    ds = NSDataset(str(root), "scene_0", img_res=(32, 32))
    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, tile_size=16, use_flat=True)
    static = seed_gaussians_from_meshes(meshes, 5e-3, cfg)
    params = init_gom_params(static, cfg)
    return ds, cfg, static, params


def _split_static(static):
    arr = {k: v for k, v in static.items()
           if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0}
    host = {k: v for k, v in static.items() if k not in arr}
    return arr, host


def test_stage4_dp_matches_single_device(setup):
    ds, cfg, static, params = setup
    h, w = ds.img_res
    B = 2
    static_arr, static_host = _split_static(static)

    # shared flat plan over the B frames
    from holoscene_tpu.models.gom import gom_opacities, gom_project
    from holoscene_tpu.ops.splat_flat import FlatPlan, plan_flat

    tiles = -(-w // cfg.tile_size)
    opac = gom_opacities(params, None)
    best = None
    for f in range(B):
        xy, _, conic, valid = gom_project(
            params, static, cfg, jnp.asarray(ds.pose_all[f]),
            jnp.asarray(ds.intrinsics[:3, :3]), w, h)
        pl = plan_flat(xy, conic, opac, valid, tiles, tiles, cfg.tile_size)
        best = pl if best is None else FlatPlan(
            span_x=max(best.span_x, pl.span_x),
            span_y=max(best.span_y, pl.span_y),
            c_max=max(best.c_max, pl.c_max))
    plan = best

    optimizer = optax.sgd(1e-3)
    opt_state = optimizer.init(params)

    keys = jax.random.split(jax.random.PRNGKey(7), B)
    poses = jnp.stack([jnp.asarray(ds.pose_all[f]) for f in range(B)])
    intrs = jnp.stack([jnp.asarray(ds.intrinsics[:3, :3])] * B)
    images = jnp.stack([
        jnp.asarray(ds.rgb_images[f].reshape(h, w, 3).transpose(2, 0, 1))
        for f in range(B)])                       # [B, 3, H, W] (chw)
    acms = jnp.ones((B, h, w))
    depths = jnp.ones((B, h, w))
    bins = [gom_flat_bins(params, static, cfg, poses[f], intrs[f], w, h,
                          plan) for f in range(B)]
    bins_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *bins)

    # ---- single-device reference: mean of per-frame grads, one sgd step
    def frame_loss(p, f):
        bg = jax.random.uniform(keys[f], (3,))
        out = render_gom(p, static, cfg, poses[f], intrs[f], w, h, bg,
                         flat_plan=plan, flat_bins=bins[f], chw=True)
        batch = {
            "image": images[f] * acms[f][None]
            + (1 - acms[f][None]) * bg[:, None, None],
            "acm": acms[f],
            "mesh_depth": depths[f],
            "mask": None,
        }
        losses = gom_loss(out, batch, cfg,
                          with_scale_reg=cfg.use_scale_regularization,
                          scales_linear=gom_scales(p, static, cfg),
                          chw=True)
        return losses["main_loss"] * 5.0 + losses["scale_reg"]

    grads = [jax.grad(frame_loss)(params, f) for f in range(B)]
    gmean = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *grads)
    updates, _ = optimizer.update(gmean, opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    # ---- dp step over a 2-device mesh
    devs = jax.devices("cpu")[:B]
    mesh = Mesh(np.array(devs), ("data",))
    step = make_stage4_dp_step(mesh, optimizer, static_host, cfg, plan,
                               loss_scale=5.0, width=w, height=h)
    dp_params, _, metrics, used, stale = step(
        static_arr, jax.tree_util.tree_map(jnp.copy, params),
        optimizer.init(params), keys, poses, intrs, images, acms, depths,
        bins_stacked)

    assert np.isfinite(float(metrics["loss"]))
    assert used.shape[0] == B and stale.shape == (B,)
    for a, b in zip(jax.tree_util.tree_leaves(dp_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
