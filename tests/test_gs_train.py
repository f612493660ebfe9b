"""gs_train CLI (reference 3dgrut train.py analog) + GSTrainer
checkpoint/resume: the CLI trains on a tiny nerf-synthetic scene, writes
eval.json + the exported artifact + ckpt.pkl, and a resumed run continues
bit-compatibly (same RNG stream) from the checkpoint."""
from __future__ import annotations

import json
import os

import numpy as np

from tests.test_gs_datasets import _write_nerf_scene


def test_gs_train_cli_and_resume(tmp_path):
    from holoscene_tpu.training.gs_train import main as gs_train

    scene = tmp_path / "lego"
    os.makedirs(scene)
    _write_nerf_scene(scene, n=3, res=16)
    out = tmp_path / "out"

    m = gs_train([
        "--dataset", "nerf", "--data_root", str(scene), "--out", str(out),
        "--iters", "8", "--capacity", "64", "--warmup", "100",
        "--eval_every", "4", "--quiet",
    ])
    assert np.isfinite(m["psnr"])
    assert os.path.exists(out / "eval.json")
    assert os.path.exists(out / "scene.ply")
    assert os.path.exists(out / "ckpt.pkl")
    with open(out / "eval.json") as f:
        assert np.isfinite(json.load(f)["ssim"])

    # resume: asking for more total iters continues from the checkpoint
    m2 = gs_train([
        "--dataset", "nerf", "--data_root", str(scene), "--out", str(out),
        "--iters", "12", "--resume", "--capacity", "64", "--warmup", "100",
        "--quiet",
    ])
    assert np.isfinite(m2["psnr"])
    # resume with iters already reached trains 0 extra steps but still evals
    m3 = gs_train([
        "--dataset", "nerf", "--data_root", str(scene), "--out", str(out),
        "--iters", "12", "--resume", "--capacity", "64", "--quiet",
    ])
    assert abs(m3["psnr"] - m2["psnr"]) < 1e-4


def test_gs_trainer_checkpoint_roundtrip_exact(tmp_path):
    """save -> load reproduces params/state/moments AND the numpy frame-
    sampling stream, so (train 4) == (train 2, save, load, train 2)."""
    import jax

    from holoscene_tpu.datasets.gs_datasets import NerfSyntheticDataset
    from holoscene_tpu.models.gaussians_free import FreeGaussianConfig
    from holoscene_tpu.training.gs_trainer import GSTrainer

    scene = tmp_path / "scene"
    os.makedirs(scene)
    _write_nerf_scene(scene, n=3, res=16)
    ds = NerfSyntheticDataset(str(scene))
    cfg = FreeGaussianConfig(capacity=64)

    a = GSTrainer(ds, cfg, warmup=100, seed=3, quiet=True)
    a.run(4, log_every=100)

    b = GSTrainer(ds, cfg, warmup=100, seed=3, quiet=True)
    b.run(2, log_every=100)
    p = str(tmp_path / "ck.pkl")
    b.save_checkpoint(p)
    c = GSTrainer(ds, cfg, warmup=100, seed=3, quiet=True)
    c.load_checkpoint(p)
    c.run(2, log_every=100)

    for k in a.params:
        np.testing.assert_allclose(
            np.asarray(a.params[k]), np.asarray(c.params[k]),
            atol=1e-6, err_msg=k,
        )
    assert a.iter_step == c.iter_step == 4
    assert bool(jax.numpy.array_equal(a.key, c.key))


def test_gs_train_on_distorted_colmap(tmp_path):
    """Training adopts the COLMAP camera's distortion model (UT projection
    in the jitted loss) — the 3DGUT train-on-distorted-captures path."""
    from tests.test_gs_datasets import _write_colmap_scene

    from holoscene_tpu.training.gs_train import main as gs_train

    _write_colmap_scene(tmp_path, model="OPENCV_FISHEYE")
    out = tmp_path / "out"
    m = gs_train([
        "--dataset", "colmap", "--data_root", str(tmp_path),
        "--out", str(out), "--iters", "6", "--capacity", "64",
        "--warmup", "100",
    ])
    assert np.isfinite(m["psnr"])


def test_gs_trainer_flat_amortized(tmp_path):
    """Free-gaussian training on the flat amortized-binning path: caches
    age per frame, refine events invalidate them, loss optimizes."""
    from holoscene_tpu.datasets.gs_datasets import NerfSyntheticDataset
    from holoscene_tpu.models.gaussians_free import FreeGaussianConfig
    from holoscene_tpu.training.gs_trainer import GSTrainer

    scene = tmp_path / "scene"
    os.makedirs(scene)
    _write_nerf_scene(scene, n=3, res=16)
    ds = NerfSyntheticDataset(str(scene))
    cfg = FreeGaussianConfig(capacity=64, sh_degree=1, tile_size=16,
                             use_flat=True, rebin_every=2)
    tr = GSTrainer(ds, cfg, warmup=4, refine_every=4, seed=1, quiet=True)
    assert tr.use_flat and tr.flat_plan is not None
    hist = tr.run(6, log_every=2)
    losses = [m["loss"] for m in hist if "loss" in m]
    assert np.isfinite(losses[-1])
    # refine at iter 4 must have dropped the caches built before it
    assert all(a <= 4 for a in tr._bins_age.values())
