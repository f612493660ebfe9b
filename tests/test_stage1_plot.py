import os

import numpy as np
import pytest

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.ns_dataset import NSDataset, NSDatasetTex
from holoscene_tpu.datasets.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("plotdata")
    generate_scene(str(root / "scene_0"), n_images=5, img_res=(24, 24))
    return str(root)


def test_nsdataset_tex(scene_dir):
    ds = NSDatasetTex(scene_dir, "scene_0", img_res=(24, 24))
    idx, sample, gt = ds[2]
    assert idx == 2
    assert sample["uv"].shape == (24 * 24, 2)
    assert gt["rgb"].shape == (24 * 24, 3)
    assert tuple(sample["image_res"]) == (24, 24)


def test_stage1_plot_writes_pngs(scene_dir, tmp_path):
    from holoscene_tpu.training.stage1 import Stage1Runner

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic.conf")
    )
    for k, v in {
        "train.num_pixels": 32, "model.implicit_network.num_levels": 3,
        "model.implicit_network.logmap": 8, "model.implicit_network.end_size": 32,
        "model.implicit_network.dims": [16, 16],
        "model.implicit_network.feature_vector_size": 16,
        "model.feature_vector_size": 16,
        "model.rendering_network.dims": [16, 16],
        "model.ray_sampler.N_samples": 6, "model.ray_sampler.N_samples_eval": 8,
        "model.ray_sampler.N_samples_extra": 2,
        "model.ray_sampler.max_total_iters": 2,
        "model.ray_sampler.beta_iters": 3, "dataset.img_res": [24, 24],
    }.items():
        conf.put(k, v)
    runner = Stage1Runner(conf, exps_folder=str(tmp_path / "exps"),
                          data_root_override=scene_dir, use_mesh=False,
                          quiet=True)
    runner.run(n_iters=2, log_every=1)
    out = runner.plot(it=1)
    assert np.isfinite(out["psnr"])
    for name in ("rendering", "normal", "depth", "instance"):
        assert os.path.exists(os.path.join(runner.plots_dir, f"{name}_1.png"))
    # metrics.jsonl written
    assert os.path.exists(os.path.join(runner.rundir, "metrics.jsonl"))
    if runner.dataset.test is not None:
        out_t = runner.plot(it=1, frame_idx=0, split="test")
        assert np.isfinite(out_t["psnr"])
        assert os.path.exists(
            os.path.join(runner.plots_dir, "rendering_test0_1.png")
        )
