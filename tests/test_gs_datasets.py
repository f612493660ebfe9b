"""3dgrut-core dataset loaders + renderer CLI (SURVEY §2.2: colmap / nerf
datasets and the render entry point)."""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys

import numpy as np


def _write_nerf_scene(root, n=4, res=20):
    from PIL import Image

    os.makedirs(root / "train", exist_ok=True)
    os.makedirs(root / "test", exist_ok=True)
    rng = np.random.default_rng(0)
    for split, cnt in (("train", n), ("test", 2)):
        frames = []
        for i in range(cnt):
            a = 2 * np.pi * i / max(cnt, 1)
            c2w = np.eye(4)
            c2w[:3, 3] = [2 * np.cos(a), 0.5, 2 * np.sin(a)]
            frames.append(
                {"file_path": f"./{split}/r_{i}",
                 "transform_matrix": c2w.tolist()}
            )
            rgba = rng.integers(0, 255, (res, res, 4), dtype=np.uint8)
            rgba[..., 3] = 255
            Image.fromarray(rgba, "RGBA").save(root / split / f"r_{i}.png")
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def _write_colmap_scene(root, n=4, res=16, model="PINHOLE"):
    from PIL import Image

    sp = root / "sparse" / "0"
    os.makedirs(sp, exist_ok=True)
    os.makedirs(root / "images", exist_ok=True)
    rng = np.random.default_rng(0)

    with open(sp / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        if model == "PINHOLE":
            f.write(struct.pack("<iiQQ", 1, 1, res, res))
            f.write(struct.pack("<4d", 20.0, 20.0, res / 2, res / 2))
        elif model == "SIMPLE_RADIAL":  # (f, cx, cy, k) — COLMAP's default
            f.write(struct.pack("<iiQQ", 1, 2, res, res))
            f.write(struct.pack("<4d", 20.0, res / 2, res / 2, 0.01))
        elif model == "OPENCV":  # (fx, fy, cx, cy, k1, k2, p1, p2)
            f.write(struct.pack("<iiQQ", 1, 4, res, res))
            f.write(struct.pack("<8d", 20.0, 20.0, res / 2, res / 2,
                                0.05, 0.01, 0.001, 0.002))
        elif model == "OPENCV_FISHEYE":  # (fx, fy, cx, cy, k1..k4)
            f.write(struct.pack("<iiQQ", 1, 5, res, res))
            f.write(struct.pack("<8d", 20.0, 20.0, res / 2, res / 2,
                                0.03, 0.001, 0.0, 0.0))
        else:
            raise ValueError(model)

    with open(sp / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # identity quat
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"im_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            Image.fromarray(
                rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            ).save(root / "images" / f"im_{i}.png")

    with open(sp / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 5))
        for i in range(5):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", i * 0.1, 0.0, 0.5))
            f.write(struct.pack("<3B", 200, 100, 50))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_nerf_synthetic_dataset(tmp_path):
    from holoscene_tpu.datasets.gs_datasets import NerfSyntheticDataset

    _write_nerf_scene(tmp_path)
    ds = NerfSyntheticDataset(str(tmp_path))
    assert ds.n_images == 4 and ds.img_res == (20, 20)
    assert ds.pose_all.shape == (4, 4, 4)
    assert ds.rgb_images.shape == (4, 400, 3)
    assert ds.test is not None and len(ds.test["pose_all"]) == 2
    # blender GL->CV flip: identity GL orientation (looking down -z) maps
    # to CV forward (+z column) = (0, 0, -1), y down
    np.testing.assert_allclose(ds.pose_all[0][:3, 2], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(ds.pose_all[0][:3, 1], [0, -1, 0], atol=1e-6)
    pts, cols = ds.seed_points(100)
    assert pts.shape == (100, 3)


def test_colmap_dataset(tmp_path):
    from holoscene_tpu.datasets.gs_datasets import ColmapDataset

    _write_colmap_scene(tmp_path)
    ds = ColmapDataset(str(tmp_path), test_every=4)
    assert ds.n_images == 3                      # 1 of 4 held out
    assert ds.test is not None and len(ds.test["pose_all"]) == 1
    assert ds.intrinsics[0, 0] == 20.0
    # identity quat, tvec t -> c2w translation = -t
    np.testing.assert_allclose(
        ds.pose_all[0][:3, 3], [0.0, 0.0, -2.0], atol=0.25
    )
    pts, cols = ds.seed_points()
    assert pts.shape == (5, 3)
    np.testing.assert_allclose(cols[0], [200 / 255, 100 / 255, 50 / 255])


def test_colmap_simple_radial(tmp_path):
    """SIMPLE_RADIAL params are (f, cx, cy, k), not (fx, fy, cx, cy) —
    COLMAP's automatic pipeline default (colmap src/base/camera_models.h)."""
    from holoscene_tpu.datasets.gs_datasets import ColmapDataset

    _write_colmap_scene(tmp_path, model="SIMPLE_RADIAL")
    ds = ColmapDataset(str(tmp_path), test_every=0)
    assert ds.intrinsics[0, 0] == 20.0 and ds.intrinsics[1, 1] == 20.0
    assert ds.intrinsics[0, 2] == 8.0 and ds.intrinsics[1, 2] == 8.0
    assert ds.intrinsics_all.shape == (4, 3, 3)


def test_gs_render_cli(tmp_path):
    from holoscene_tpu.models.gom import write_gaussian_ply

    _write_nerf_scene(tmp_path / "scene", n=2, res=16)
    rng = np.random.default_rng(0)
    n = 200
    g = {
        "means": rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
        "quats": np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32),
        "log_scales": np.full((n, 3), -3.0, np.float32),
        "opacity_logits": np.full((n,), 2.0, np.float32),
        "features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 15, 3), np.float32),
    }
    ply = str(tmp_path / "g.ply")
    write_gaussian_ply(ply, g)
    out = str(tmp_path / "renders")
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        [sys.executable, "-m", "holoscene_tpu.training.gs_render",
         "--ply", ply, "--dataset", "nerf",
         "--data_root", str(tmp_path / "scene"), "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=900,  # fresh-process CPU compile; slow under host load
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "render_0000.png"))
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert np.isfinite(m["mean"]["psnr"])


def test_colmap_distortion_models_surface_camera():
    """COLMAP distortion params must reach the renderer: OPENCV -> opencv
    (k1,k2,p1,p2), OPENCV_FISHEYE -> fisheye (k1..k4), SIMPLE_RADIAL ->
    opencv (k,0,0,0), PINHOLE -> pinhole/None (the 3DGUT UT-projection
    inputs; ops/gaussians.camera_project layout)."""
    from holoscene_tpu.datasets.gs_datasets import ColmapDataset

    cases = {
        "PINHOLE": ("pinhole", None),
        "SIMPLE_RADIAL": ("opencv", (0.01, 0.0, 0.0, 0.0)),
        "OPENCV": ("opencv", (0.05, 0.01, 0.001, 0.002)),
        "OPENCV_FISHEYE": ("fisheye", (0.03, 0.001, 0.0, 0.0)),
    }
    import tempfile
    from pathlib import Path

    for model, (want_cam, want_dist) in cases.items():
        with tempfile.TemporaryDirectory() as d:
            _write_colmap_scene(Path(d), model=model)
            ds = ColmapDataset(d, test_every=0)
            assert ds.camera_model == want_cam, model
            if want_dist is None:
                assert ds.dist is None
            else:
                np.testing.assert_allclose(ds.dist, want_dist, atol=1e-12)


def test_gs_render_cli_adopts_colmap_distortion(tmp_path):
    from holoscene_tpu.models.gom import write_gaussian_ply

    _write_colmap_scene(tmp_path, model="OPENCV")
    rng = np.random.default_rng(1)
    n = 64
    g = {
        "means": rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
        "quats": np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32),
        "log_scales": np.full((n, 3), -3.0, np.float32),
        "opacity_logits": np.full((n,), 2.0, np.float32),
        "features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 15, 3), np.float32),
    }
    ply = str(tmp_path / "g.ply")
    write_gaussian_ply(ply, g)
    out = str(tmp_path / "renders")
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        [sys.executable, "-m", "holoscene_tpu.training.gs_render",
         "--ply", ply, "--dataset", "colmap",
         "--data_root", str(tmp_path), "--split", "train", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dataset camera: opencv" in res.stdout, res.stdout
    assert os.path.exists(os.path.join(out, "metrics.json"))
