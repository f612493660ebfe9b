import io

import numpy as np
import pytest
from PIL import Image

from holoscene_tpu.export.glb import export_glb, read_glb_json
from holoscene_tpu.export.usd import export_gaussians_usda, export_usd
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def _sphere_mesh(r=0.4, res=14):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
    return Mesh(v, f)


def _uvs_for(mesh):
    uv = (mesh.vertices[:, :2] - mesh.vertices[:, :2].min(0)) / np.ptp(
        mesh.vertices[:, :2], axis=0
    )
    return uv


def test_glb_roundtrip(tmp_path):
    m1 = _sphere_mesh()
    m1.uvs = _uvs_for(m1)
    m2 = _sphere_mesh(r=0.2)
    buf = io.BytesIO()
    Image.fromarray(
        np.full((16, 16, 3), [200, 30, 30], dtype=np.uint8)
    ).save(buf, format="PNG")
    png = buf.getvalue()

    path = str(tmp_path / "scene.glb")
    export_glb(path, [m1, m2], textures_png=[png, None],
               translations={1: np.array([0.1, 0.0, 0.0])})

    gltf = read_glb_json(path)
    assert gltf["asset"]["version"] == "2.0"
    assert len(gltf["meshes"]) == 2
    assert len(gltf["nodes"]) == 2
    assert "materials" in gltf and len(gltf["materials"]) == 1
    assert "images" in gltf
    prim0 = gltf["meshes"][0]["primitives"][0]
    assert "TEXCOORD_0" in prim0["attributes"]
    assert prim0["material"] == 0
    # accessors consistent
    acc = gltf["accessors"][prim0["attributes"]["POSITION"]]
    assert acc["count"] == len(m1.vertices)


def test_usd_scene(tmp_path):
    m_bg = _sphere_mesh(r=0.9)
    m_obj = _sphere_mesh(r=0.2)
    path = export_usd(
        str(tmp_path), [m_bg, m_obj],
        translations={1: np.array([0.0, 0.1, 0.0])},
        textures={1: "surface_1.png"},
    )
    text = open(path).read()
    assert text.startswith("#usda 1.0")
    assert 'def Mesh "object_0"' in text
    assert 'def Mesh "object_1"' in text
    # physics schemas: object_1 dynamic, object_0 static
    assert text.count("PhysicsRigidBodyAPI") == 1
    assert text.count("PhysicsCollisionAPI") == 2
    assert "physxRigidBody:enableCCD" in text
    assert 'token physics:approximation = "sdf"' in text
    assert "PhysicsScene" in text
    assert "UsdPreviewSurface" in text


def test_gaussian_usda(tmp_path):
    n = 5
    g = {
        "means": np.random.default_rng(0).normal(size=(n, 3)),
        "quats": np.tile([1.0, 0, 0, 0], (n, 1)),
        "log_scales": np.full((n, 3), -3.0),
        "opacity_logits": np.zeros(n),
        "features_dc": np.zeros((n, 3)),
        "features_rest": np.zeros((n, 3, 3)),
    }
    path = export_gaussians_usda(str(tmp_path / "gs.usda"), g)
    text = open(path).read()
    assert "def Points" in text
    assert "primvars:rot_wxyz" in text
    assert text.count("(") > n  # point tuples present
