import numpy as np
import pytest

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.models.fields import ColorFieldConfig
from holoscene_tpu.training.stage3 import Stage3Runner
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh, read_obj


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("s3")
    generate_scene(str(root / "scene_0"), n_images=6, img_res=(32, 32))
    return NSDataset(str(root), "scene_0", img_res=(32, 32))


def _sphere_mesh(center, r, res=20, scale=1.3):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    c = np.asarray(center) / scale
    sdf = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) - r / scale
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
    return Mesh(v, f)


def test_stage3_trains_and_bakes(scene, tmp_path):
    from holoscene_tpu.datasets.synthetic import DEFAULT_SPHERES

    sp = DEFAULT_SPHERES[0]  # red sphere = instance id 1
    mesh = _sphere_mesh(sp["center"], sp["radius"])
    cfg = ColorFieldConfig(num_levels=4, logmap=12, end_size=64, hidden=32)
    runner = Stage3Runner(
        [None, mesh], scene, cfg=cfg, max_total_iters=600,
        pixels_per_step=512, out_dir=str(tmp_path), texture_res=128,
        quiet=True,
    )
    losses = runner.train_object(1, n_iters=60)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    obj_path = runner.export_mesh_texture(1, texture_res=128)
    baked = read_obj(obj_path)
    assert baked.uvs is not None and len(baked.uvs) == len(baked.vertices)
    assert (tmp_path / "surface_1.png").exists()
    assert (tmp_path / "surface_1.mtl").exists()

    from PIL import Image

    tex = np.asarray(Image.open(tmp_path / "surface_1.png"), dtype=np.float32) / 255
    # trained on a red-ish sphere: the texture should be red-dominant
    assert tex[..., 0].mean() > tex[..., 2].mean()
