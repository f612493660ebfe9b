import numpy as np

from holoscene_tpu.export.load_scene import load_scene, load_usda
from holoscene_tpu.export.usd import export_usd
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def _sphere(r=0.3, res=12):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3,
                               use_native=False)
    return Mesh(v, f)


def test_usda_roundtrip(tmp_path):
    bg = _sphere(0.8)
    obj = _sphere(0.2)
    path = export_usd(str(tmp_path / "usd"), [bg, obj],
                      translations={1: np.array([0.1, 0.2, 0.3])})
    stage = load_usda(path)
    assert stage["gravity"] == 9.81
    prims = stage["prims"]
    assert set(prims) == {"object_0", "object_1"}
    assert not prims["object_0"]["dynamic"]
    assert prims["object_1"]["dynamic"]
    np.testing.assert_allclose(prims["object_1"]["translate"], [0.1, 0.2, 0.3])
    assert len(prims["object_0"]["points"]) == len(bg.vertices)
    assert prims["object_0"]["faces"].shape == bg.faces.shape


def test_load_scene_dir(tmp_path):
    from holoscene_tpu.export.glb import export_glb

    bg = _sphere(0.8)
    export_usd(str(tmp_path / "usd"), [bg])
    export_glb(str(tmp_path / "scene.glb"), [bg])
    scene = load_scene(str(tmp_path))
    assert scene["glb"] is not None
    assert scene["usd"] is not None
    assert "object_0" in scene["usd"]["prims"]
