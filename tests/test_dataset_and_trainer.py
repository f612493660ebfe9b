import os

import numpy as np
import pytest

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.ns_dataset import NSDataset, extract_graph_node_properties
from holoscene_tpu.datasets.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_synth")
    generate_scene(str(root / "scene_0"), n_images=6, img_res=(32, 32))
    return str(root)


def test_graph_properties():
    graph = [
        {"node_id": 0, "adj_nodes": [1, 2]},
        {"node_id": 1, "adj_nodes": [0, 3]},
        {"node_id": 2, "adj_nodes": [0]},
        {"node_id": 3, "adj_nodes": [1]},
    ]
    props = extract_graph_node_properties(graph)
    assert props[0]["parent"] == -1 and props[0]["root"]
    assert props[1]["parent"] == 0
    assert props[3]["parent"] == 1
    assert props[0]["desc"] == [1, 2, 3]
    assert props[1]["desc"] == [3]
    assert props[3]["leaf"] and not props[0]["leaf"]
    assert props[3]["dist_to_root"] == 2
    # layers: leaves first
    assert props[3]["layer"] == 0 and props[0]["layer"] == 2


def test_dataset_loads_synthetic(scene_dir):
    ds = NSDataset(scene_dir, "scene_0", img_res=(32, 32), test_split=True)
    assert ds.num_instances == 2  # two spheres
    assert ds.label_mapping == [0, 1, 2]
    assert ds.graph_node_dict is not None
    assert ds.rgb_images.shape == (ds.n_images, 32 * 32, 3)
    assert ds.depth_images.shape == (ds.n_images, 32 * 32, 1)
    assert ds.normal_images.shape == (ds.n_images, 32 * 32, 3)
    # camera-bbox normalization keeps cameras within unit-ish box
    assert np.abs(ds.pose_all[:, :3, 3]).max() <= 1.0
    # test split exists
    assert ds.test is not None and len(ds.test["pose_all"]) >= 1
    # normals decoded to [-1, 1]
    assert ds.normal_images.min() >= -1.0 and ds.normal_images.max() <= 1.0


def test_sample_rays_static_shape_and_balance(scene_dir):
    ds = NSDataset(scene_dir, "scene_0", img_res=(32, 32))
    for _ in range(4):
        idx, sample, gt = ds.sample_rays(128)
        assert sample["uv"].shape == (128, 2)
        assert gt["rgb"].shape == (128, 3)
        assert gt["segs"].shape == (128,)
    # class-targeted sampling draws only that class
    if 1 in ds.class_id_occurences and ds.class_id_occurences[1]:
        _, sample, gt = ds.sample_rays(64, class_id=1)
        assert np.all(gt["segs"] == 1)


def test_depth_normal_consistency(scene_dir):
    """Generator sanity: rendered GT depth is positive and normals unit."""
    ds = NSDataset(scene_dir, "scene_0", img_res=(32, 32))
    assert np.all(ds.depth_images > 0)
    norms = np.linalg.norm(ds.normal_images, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=0.02)


def test_stage1_runner_smoke(scene_dir, tmp_path):
    """Short end-to-end training run through the conf-driven runner."""
    from holoscene_tpu.training.stage1 import Stage1Runner

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic.conf")
    )
    # shrink for CI speed
    conf.put("train.num_pixels", 64)
    conf.put("model.implicit_network.num_levels", 4)
    conf.put("model.implicit_network.logmap", 10)
    conf.put("model.implicit_network.end_size", 64)
    conf.put("model.implicit_network.dims", [32, 32])
    conf.put("model.implicit_network.feature_vector_size", 32)
    conf.put("model.feature_vector_size", 32)
    conf.put("model.rendering_network.dims", [32, 32])
    conf.put("model.ray_sampler.N_samples", 8)
    conf.put("model.ray_sampler.N_samples_eval", 12)
    conf.put("model.ray_sampler.N_samples_extra", 4)
    conf.put("model.ray_sampler.max_total_iters", 2)
    conf.put("model.ray_sampler.beta_iters", 4)
    conf.put("dataset.img_res", [32, 32])
    conf.put("train.checkpoint_freq", 10)

    runner = Stage1Runner(
        conf, exps_folder=str(tmp_path / "exps"), data_root_override=scene_dir,
        use_mesh=False, quiet=True,
    )
    assert runner.model_cfg.implicit.d_out == 3  # from dataset instance count
    hist = runner.run(n_iters=21, log_every=5)
    assert len(hist) >= 3
    assert all(np.isfinite(h["loss"]) for h in hist)
    # checkpoint written and resumable
    ckpt_dir = runner.checkpoints_path
    assert os.path.exists(os.path.join(ckpt_dir, "ModelParameters", "latest.msgpack"))

    runner2 = Stage1Runner(
        conf, exps_folder=str(tmp_path / "exps"), data_root_override=scene_dir,
        is_continue=True, timestamp=runner.timestamp, use_mesh=False, quiet=True,
    )
    assert runner2.start_iter > 0


def test_stage1_exact_bwd_anneal(scene_dir, tmp_path):
    """train.exact_bwd_from_iter swaps the sampled table backward for the
    exact one mid-run (and training stays finite across the re-jit)."""
    from holoscene_tpu.training.stage1 import Stage1Runner

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic.conf")
    )
    conf.put("train.num_pixels", 64)
    conf.put("model.implicit_network.num_levels", 4)
    conf.put("model.implicit_network.logmap", 10)
    conf.put("model.implicit_network.end_size", 64)
    conf.put("model.implicit_network.dims", [32, 32])
    conf.put("model.implicit_network.feature_vector_size", 32)
    conf.put("model.feature_vector_size", 32)
    conf.put("model.rendering_network.dims", [32, 32])
    conf.put("model.ray_sampler.N_samples", 8)
    conf.put("model.ray_sampler.N_samples_eval", 12)
    conf.put("model.ray_sampler.N_samples_extra", 4)
    conf.put("model.ray_sampler.max_total_iters", 2)
    conf.put("model.ray_sampler.beta_iters", 4)
    conf.put("dataset.img_res", [32, 32])
    conf.put("model.forward_grad_mode", "fused")
    conf.put("train.exact_bwd_from_iter", 3)

    runner = Stage1Runner(
        conf, exps_folder=str(tmp_path / "exps"), data_root_override=scene_dir,
        use_mesh=False, quiet=True,
    )
    assert runner.model_cfg.implicit.color_bwd_sample  # sampled until iter 3
    hist = runner.run(n_iters=6, log_every=1)
    assert not runner.model_cfg.implicit.color_bwd_sample
    assert not runner.model_cfg.implicit.sdf_bwd_sample
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_stage1_sharded_smoke(scene_dir, tmp_path):
    """Same trainer over the virtual 8-device CPU mesh (dp over rays)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs forced multi-device CPU")
    from holoscene_tpu.training.stage1 import Stage1Runner

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic.conf")
    )
    conf.put("train.num_pixels", 64)
    conf.put("model.implicit_network.num_levels", 4)
    conf.put("model.implicit_network.logmap", 10)
    conf.put("model.implicit_network.end_size", 64)
    conf.put("model.implicit_network.dims", [32, 32])
    conf.put("model.implicit_network.feature_vector_size", 32)
    conf.put("model.feature_vector_size", 32)
    conf.put("model.rendering_network.dims", [32, 32])
    conf.put("model.ray_sampler.N_samples", 8)
    conf.put("model.ray_sampler.N_samples_eval", 12)
    conf.put("model.ray_sampler.N_samples_extra", 4)
    conf.put("model.ray_sampler.max_total_iters", 2)
    conf.put("model.ray_sampler.beta_iters", 4)
    conf.put("dataset.img_res", [32, 32])

    runner = Stage1Runner(
        conf, exps_folder=str(tmp_path / "exps"), data_root_override=scene_dir,
        use_mesh=True, quiet=True,
    )
    assert runner.mesh is not None
    hist = runner.run(n_iters=3, log_every=1)
    assert all(np.isfinite(h["loss"]) for h in hist)
