"""Real-data-format fixture E2E (VERDICT r2 #8): the checked-in miniature
scene in tests/fixtures/real_format/ was ray-cast by an independent
renderer (scripts/gen_real_format_fixture.py) and written in the two real
on-disk formats the framework consumes:

  * ns_scene/  — Replica/ScanNet NSDataset layout (reference
    datasets/ns_dataset.py:19-479): stage-1 trains on it.
  * colmap/    — COLMAP binary with an OPENCV-distortion camera whose
    images were rendered THROUGH that distortion, plus surface-sampled
    colored points3D (reference threedgrut/datasets/dataset_colmap.py).

The distortion consistency test is the sharp one: projecting a colored 3D
surface point through the LOADER's camera model must land on an image pixel
of that color. A dropped or mis-scaled k1/k2/p1/p2 moves the landing spot
by several pixels at the frame edge and the colors stop matching.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "real_format")


def test_ns_scene_loads_and_stage1_trains():
    from holoscene_tpu.config import ConfigFactory
    from holoscene_tpu.training.stage1 import Stage1Runner

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(__file__), "..", "confs",
                     "synthetic.conf"))
    conf.put("dataset.data_root_dir", FIX)
    conf.put("dataset.data_dir", "ns_scene")
    conf.put("dataset.img_res", [72, 96])
    conf.put("train.num_pixels", 128)
    conf.put("train.expname", "real_format_fixture")

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            runner = Stage1Runner(conf, exps_folder="exps", use_mesh=False,
                                  quiet=True)
            ds = runner.dataset
            # loader facts: 3 semantic ids (bg + 2 spheres), non-square res,
            # graph parsed with the room as root
            assert ds.num_instances == 2
            assert ds.img_res == (72, 96)
            assert ds.graph_node_dict[0]["dist_to_root"] == 0
            assert ds.graph_node_dict[1]["dist_to_root"] == 1

            first = runner.plot(it=0, frame_idx=0)["psnr"]
            runner.run(n_iters=60, log_every=30)
            final = runner.plot(it=60, frame_idx=0)["psnr"]
            assert final > first + 1.0, (first, final)
            # depth priors round-trip: rendered depth correlates with the
            # fixture's analytic z-depth on the trained model is too slow to
            # gate here; the loss using depth/normal priors not NaN suffices
            assert np.isfinite(final)
        finally:
            os.chdir(cwd)


@pytest.fixture(scope="module")
def colmap_ds():
    from holoscene_tpu.datasets.gs_datasets import ColmapDataset

    return ColmapDataset(os.path.join(FIX, "colmap"))


def test_colmap_opencv_distortion_consistency(colmap_ds):
    """Project points3D through the loader's distortion model; the pixel
    under each unoccluded projection must carry the point's color."""
    ds = colmap_ds
    assert ds.camera_model == "opencv" and ds.dist is not None
    k1, k2, p1, p2 = ds.dist[:4]
    assert abs(k1 + 0.08) < 1e-9, "k1 not read from cameras.bin"

    pts = np.asarray(ds.points_xyz)
    cols = np.asarray(ds.points_rgb, dtype=np.float64)
    if cols.max() > 1.5:
        cols = cols / 255.0
    h, w = np.asarray(ds.rgb_images[0]).reshape(
        ds.img_res[0], ds.img_res[1], 3).shape[:2]

    checked = 0
    good = 0
    for fi in range(ds.n_images):
        c2w = np.asarray(ds.pose_all[fi])
        img = np.asarray(ds.rgb_images[fi]).reshape(h, w, 3)
        w2c = np.linalg.inv(c2w)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        xn, yn = pc[:, 0] / z, pc[:, 1] / z
        r2 = xn * xn + yn * yn
        rad = 1 + k1 * r2 + k2 * r2 * r2
        xd = xn * rad + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
        yd = yn * rad + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
        intr = np.asarray(ds.intrinsics)
        u = intr[0, 0] * xd + intr[0, 2]
        v = intr[1, 1] * yd + intr[1, 2]
        ok = (z > 0.2) & (u >= 1) & (u < w - 1) & (v >= 1) & (v < h - 1)
        # only front-facing points can match: cheap visibility proxy =
        # sample and compare, requiring a clear majority to match
        ui, vi = u[ok].astype(int), v[ok].astype(int)
        pix = img[vi, ui]
        err = np.abs(pix - cols[ok]).max(axis=-1)
        good += int((err < 0.22).sum())
        checked += int(ok.sum())
    assert checked > 200
    # roughly half the surface points face away (occluded by their own
    # sphere) — a correct camera+distortion chain matches the visible half;
    # a dropped k1 at this distortion strength breaks edge projections by
    # 2-4 px and pushes the match rate well below 0.35
    assert good / checked > 0.42, (good, checked)


def test_colmap_gs_train_steps(colmap_ds):
    """A few free-gaussian training steps through the fixture's distorted
    camera: loss must drop (the UT projection consumes the distortion,
    gs_train.py:75-82 wiring)."""
    from holoscene_tpu.models.gaussians_free import FreeGaussianConfig
    from holoscene_tpu.training.gs_trainer import GSTrainer

    ds = colmap_ds
    cfg = FreeGaussianConfig(capacity=512, sh_degree=1, tile_size=8,
                             max_per_tile=64, camera_model=ds.camera_model,
                             dist=ds.dist)
    tr = GSTrainer(ds, cfg, warmup=10**9, quiet=True)
    hist = tr.run(40, log_every=1)
    losses = [m["loss"] for m in hist if "loss" in m]
    assert np.isfinite(losses[-1])
    # 512 capacity-bound gaussians plateau fast on CPU; the distortion MATH
    # is validated by test_colmap_opencv_distortion_consistency — this test
    # proves the training loop consumes the fixture end-to-end and optimizes
    assert losses[-1] < losses[0] * 0.88, (losses[0], losses[-1])
