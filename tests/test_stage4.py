import numpy as np
import pytest

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.models.gom import GoMConfig
from holoscene_tpu.training.stage4 import Stage4Runner
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("s4")
    generate_scene(str(root / "scene_0"), n_images=6, img_res=(32, 32))
    ds = NSDataset(str(root), "scene_0", img_res=(32, 32))
    return ds


def _gt_meshes(res=20):
    """Analytic meshes matching the synthetic scene in NORMALIZED coords.

    generate_scene places cameras on a ring of radius .65 at y=.1; NSDataset
    normalizes by the camera bbox (scale = 1.3), so world geometry shrinks
    accordingly."""
    from holoscene_tpu.datasets.synthetic import DEFAULT_SPHERES, ROOM_HALF

    scale = 1.3  # camera bbox max extent (ring diameter)
    meshes = []
    # room walls: inverted box -> use a big sphere shell as the bg proxy
    axis = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sp = 2.0 / (res - 1)
    room = np.maximum.reduce([np.abs(x), np.abs(y), np.abs(z)]) - ROOM_HALF / scale
    v, f = marching_tetrahedra(-room, origin=(-1,) * 3, spacing=(sp,) * 3)
    meshes.append(Mesh(v, f))
    for s in DEFAULT_SPHERES:
        c = np.asarray(s["center"]) / scale
        r = s["radius"] / scale
        sdf = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) - r
        v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
        meshes.append(Mesh(v, f))
    return meshes


def test_stage4_end_to_end(scene, tmp_path):
    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, max_per_tile=128, tile_size=16)
    runner = Stage4Runner(
        meshes, scene, cfg=cfg, area_to_subdivide=5e-3,
        max_total_iters=40, out_dir=str(tmp_path / "out"), quiet=True,
    )
    assert len(runner.instance_ranges) == 3
    hist = runner.run(n_iters=30, log_every=10)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # optimization makes progress on L1
    assert hist[-1]["l1"] < hist[0]["l1"]

    paths = runner.export()
    assert len(paths) == 5
    # the scene-level USDZ artifact (3dgrut NuRec schema)
    from holoscene_tpu.export.gs_usdz import read_gaussians_usdz

    usdz = [p for p in paths if p.endswith(".usdz")][0]
    back = read_gaussians_usdz(usdz)
    assert back["positions"].shape[1] == 3
    from holoscene_tpu.models.gom import compose_for_export, read_gaussian_ply

    g = read_gaussian_ply(paths[0])
    lo, hi = runner.instance_ranges[0]
    assert len(g["means"]) == hi - lo
    # export round-trip FIDELITY (reference eval_gs_load_train/test reloads
    # the export and recomputes metrics, holoscene_train_gaussian.py:739):
    # the PLY must reproduce the trainer's composed gaussians to fp32
    ref = compose_for_export(runner.params, runner.static, runner.cfg)
    back = read_gaussian_ply(paths[-2])  # gauss_scene.ply
    for k in ("means", "quats", "log_scales", "opacity_logits",
              "features_dc", "features_rest"):
        np.testing.assert_allclose(
            np.asarray(back[k], np.float32).reshape(ref[k].shape),
            ref[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_stage4_main_step_updates_params(scene, tmp_path):
    """One main-view _step call must change params (no invis views in play).

    Regression guard: a step_fn rewrite once dropped optax.apply_updates,
    making camera-view training a no-op that the end-to-end progress
    assertion missed (invis-view steps still updated params)."""
    import jax
    import jax.numpy as jnp

    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, max_per_tile=128, tile_size=16)
    runner = Stage4Runner(
        meshes, scene, cfg=cfg, area_to_subdivide=5e-3,
        max_total_iters=4, out_dir=str(tmp_path / "out"), quiet=True,
    )
    assert not any(len(v) for v in runner.vis_info_list)  # no invis packs
    h, w = runner.dataset.img_res
    acm, mesh_depth = runner._frame_mesh_raster(0)
    # step_fn takes channels-major [3,H,W] images (see stage4 run loop)
    image = runner.dataset.rgb_images[0].reshape(h, w, 3).transpose(2, 0, 1)
    before = jax.tree_util.tree_map(jnp.copy, runner.params)
    params, _, metrics, _, _, _ = runner._step(
        runner.params, runner.opt_state, jax.random.PRNGKey(0),
        jnp.asarray(runner.dataset.pose_all[0]),
        jnp.asarray(runner.dataset.intrinsics[:3, :3]),
        jnp.asarray(image), jnp.asarray(acm), jnp.asarray(mesh_depth),
        None,
    )
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, before)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0, (
        "main train step left every param leaf unchanged")


def test_stage4_auto_max_per_tile(scene, tmp_path):
    """max_per_tile=0 auto-picks K from p99 tile overlap at trainer init."""
    meshes = _gt_meshes()
    runner = Stage4Runner(
        meshes, scene,
        cfg=GoMConfig(max_per_tile=0, sh_degree=1, use_pallas=False),
        area_to_subdivide=1e-3,
        max_total_iters=1,
        out_dir=str(tmp_path / "s4auto"),
        quiet=True,
    )
    k = runner.cfg.max_per_tile
    assert k >= 64 and k <= 1024 and (k & (k - 1)) == 0
    runner.run(n_iters=1, log_every=10)


def test_tile_overlap_excludes_invalid_gaussians():
    """Behind-camera gaussians never composite, so they must not inflate
    tile-overlap counts (they drive the auto max_per_tile choice)."""
    import jax.numpy as jnp

    from holoscene_tpu.ops.splat import tile_overlap_counts

    n = 64
    means_behind = np.concatenate(
        [np.random.default_rng(0).uniform(-0.3, 0.3, (n, 2)),
         np.full((n, 1), -2.0)], axis=1
    ).astype(np.float32)  # z < 0: behind the camera
    quats = np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = np.full((n, 3), 0.05, np.float32)
    intr = np.array([[32, 0, 32], [0, 32, 32], [0, 0, 1]], np.float32)
    counts = tile_overlap_counts(
        jnp.asarray(means_behind), jnp.asarray(quats),
        jnp.asarray(scales), jnp.eye(4), jnp.asarray(intr), 64, 64
    )
    assert int(np.asarray(counts).max()) == 0

    # sanity: the same gaussians in FRONT of the camera do count
    means_front = means_behind.copy()
    means_front[:, 2] = 2.0
    counts_f = tile_overlap_counts(
        jnp.asarray(means_front), jnp.asarray(quats),
        jnp.asarray(scales), jnp.eye(4), jnp.asarray(intr), 64, 64
    )
    assert int(np.asarray(counts_f).max()) > 0


def test_stage4_flat_amortized_binning(scene, tmp_path):
    """The flat-pipeline trainer path: per-frame cached index plans with a
    rebin cadence, exact compositing (no K), overflow-safe."""
    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, tile_size=16, use_flat=True, rebin_every=2)
    runner = Stage4Runner(
        meshes, scene, cfg=cfg, area_to_subdivide=5e-3,
        max_total_iters=12, out_dir=str(tmp_path / "outf"), quiet=True,
    )
    assert runner.use_flat and runner.flat_plan is not None
    hist = runner.run(n_iters=8, log_every=4)
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert hist[-1]["l1"] < hist[0]["l1"] * 1.05  # optimizing, not diverging
    # per-frame plans were cached and aged
    assert len(runner._bins_cache) >= 1
    assert max(runner._bins_age.values()) >= 1
    ev = runner.eval_split("train", max_frames=1)
    assert np.isfinite(ev["psnr"])


def test_stage4_adaptive_rebin_drift(scene, tmp_path):
    """rebin_drift_px > 0: rebins happen on measured screen drift instead
    of a fixed cadence — training stays finite/progressing, the drift flag
    is produced, and the rebin count stays below the pure-cadence count."""
    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, tile_size=16, use_flat=True,
                    rebin_every=2, rebin_drift_px=0.5, trim_flat=False)
    runner = Stage4Runner(
        meshes, scene, cfg=cfg, area_to_subdivide=5e-3,
        max_total_iters=20, out_dir=str(tmp_path / "outd"), quiet=True,
    )
    hist = runner.run(n_iters=16, log_every=8)
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert hist[-1]["l1"] < hist[0]["l1"] * 1.05
    # pure cadence at rebin_every=2 would refresh ~ every other visit
    # (>= 6 of 16); drift-guarded long-stop (16) needs only the initial
    # per-frame binning plus drift-triggered ones
    assert runner.rebin_count <= scene.n_images + 4
    # the drift diagnostic flows: a fresh plan + one step yields drift >= 0
    import jax
    import jax.numpy as jnp

    h, w = scene.img_res
    pose = jnp.asarray(scene.pose_all[0])
    intr = jnp.asarray(scene.intrinsics[:3, :3])
    bins = runner._get_bins(0, pose, intr)
    acm, mesh_depth = runner._frame_mesh_raster(0)
    image = scene.rgb_images[0].reshape(h, w, 3).transpose(2, 0, 1)
    *_rest, drift = runner._step(
        runner.params, runner.opt_state, jax.random.PRNGKey(0), pose, intr,
        jnp.asarray(image), jnp.asarray(acm), jnp.asarray(mesh_depth), bins)
    assert float(drift) >= 0.0


def test_stage4_flat_trim_activates_and_trains(scene, tmp_path):
    """Flat path with trim_flat: after every frame reports walked-chunk
    counts the trainer swaps to the trimmed static plan (or proves there is
    nothing to trim), keeps training finite, and eval renders still run
    under the full plan."""
    import jax.numpy as jnp

    meshes = _gt_meshes()
    cfg = GoMConfig(sh_degree=1, tile_size=16, use_flat=True,
                    rebin_every=4, trim_flat=True, trim_slack=1)
    runner = Stage4Runner(
        meshes, scene, cfg=cfg, area_to_subdivide=5e-3,
        max_total_iters=80, out_dir=str(tmp_path / "out"), quiet=True,
    )
    assert runner.use_flat
    full_cmax = runner.flat_plan_full.c_max
    hist = runner.run(n_iters=60, log_every=20)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # 60 random draws over 6 frames: all frames visited (coupon collector
    # p_fail < 1e-9 at this ratio), so the trim decision has been made
    assert len(runner._used_cache) == scene.n_images
    assert runner._trim_active
    assert runner.flat_plan.c_max <= full_cmax
    # the cached used counts are REAL per-tile walk telemetry, not a
    # dropped-key default (a silent used=0 once capped every tile at
    # trim_slack chunks — truncated renders, diverging training)
    u = np.asarray(next(iter(runner._used_cache.values())))
    assert u.ndim == 1 and u.max() >= 1
    # trimmed-bins training render == exact full-plan render (same params)
    from holoscene_tpu.models.gom import render_gom

    static = {**runner._static_host, **runner._static_arr}
    pose = jnp.asarray(scene.pose_all[0])
    intr = jnp.asarray(scene.intrinsics[:3, :3])
    h, w = scene.img_res
    bins = runner._get_bins(0, pose, intr)
    ot = render_gom(runner.params, static, runner.cfg, pose, intr, w, h,
                    jnp.zeros(3), flat_plan=runner.flat_plan, flat_bins=bins)
    of = render_gom(runner.params, static, runner.cfg, pose, intr, w, h,
                    jnp.zeros(3), flat_plan=runner.flat_plan_full)
    assert float(jnp.max(jnp.abs(ot["rgb"] - of["rgb"]))) < 1e-5
    assert float(jnp.max(jnp.abs(
        ot["accumulation"] - of["accumulation"]))) < 1e-5
    # flat-path flags survive the render_gom layer
    assert "used_chunks" in ot and "stale" in ot and "overflow" in ot
    # eval path renders exactly under the full plan after the swap
    m = runner.eval_split("train", max_frames=1)
    assert np.isfinite(m["psnr"])
    # convergence: trim must not break optimization (the 43->80 divergence)
    assert hist[-1]["loss"] < hist[0]["loss"]
