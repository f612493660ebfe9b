"""Run-dir-aware export CLI (holoscene_tpu/export/cli.py) — the analog of
the reference's export/export_{glb,usd,gs_usd}.py drivers: artifact
discovery from <exps>/<expname>/<timestamp>/plots and the three outputs."""
from __future__ import annotations

import io
import os
import pickle

import numpy as np
from PIL import Image

from holoscene_tpu.export.cli import main as export_main
from holoscene_tpu.export.glb import read_glb_json
from holoscene_tpu.models.gom import write_gaussian_ply
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh, write_obj, write_ply


def _sphere_mesh(r=0.4, res=10):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
    return Mesh(v, f)


def _fake_rundir(tmp_path):
    rundir = tmp_path / "exps" / "holoscene_synth_export" / "2026_01_01_00_00_00"
    plots = rundir / "plots"
    os.makedirs(plots)

    bg = _sphere_mesh(0.8)
    write_ply(str(plots / "coarse_recon_obj_0.ply"), bg)

    obj = _sphere_mesh(0.3)
    uv = (obj.vertices[:, :2] - obj.vertices[:, :2].min(0)) / np.ptp(
        obj.vertices[:, :2], axis=0
    )
    tex = Mesh(obj.vertices, obj.faces, uvs=uv)
    write_obj(str(plots / "surface_1.obj"), tex, mtl_name="surface_1.mtl",
              texture_png="surface_1.png")
    img = Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (16, 16, 3))).astype(np.uint8)
    )
    img.save(plots / "surface_1.png")

    with open(plots / "translation_dict.pkl", "wb") as f:
        pickle.dump({1: np.asarray([0.1, 0.0, 0.05], np.float32)}, f)

    n = 12
    rng = np.random.default_rng(1)
    write_gaussian_ply(
        str(plots / "gauss_scene.ply"),
        {
            "means": rng.normal(size=(n, 3)).astype(np.float32),
            "log_scales": np.full((n, 3), -3.0, np.float32),
            "quats": np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
            "opacity_logits": np.zeros((n,), np.float32),
            "features_dc": rng.normal(size=(n, 3)).astype(np.float32),
            "features_rest": np.zeros((n, 3, 3), np.float32),
        },
    )
    return rundir


def _conf(tmp_path):
    p = tmp_path / "export.conf"
    p.write_text("train{ expname = holoscene_synth_export }\n")
    return str(p)


def test_export_cli_all_targets(tmp_path):
    rundir = _fake_rundir(tmp_path)
    conf = _conf(tmp_path)
    exps = str(tmp_path / "exps")
    plots = str(rundir / "plots")

    out = export_main(["glb", "--conf", conf, "--exps_folder", exps])
    assert out == os.path.join(plots, "scene.glb")
    gltf = read_glb_json(out)
    assert len(gltf["meshes"]) == 2
    # the textured object carries an image; the translation lands on node 1
    assert len(gltf.get("images", [])) == 1
    # translations are baked into the vertex positions (glb.py:77-78):
    # object_1 (sphere r=0.3) was shifted +0.1 in x by translation_dict.pkl
    pos_acc = gltf["accessors"][
        gltf["meshes"][1]["primitives"][0]["attributes"]["POSITION"]
    ]
    # shifted bounds are asymmetric around 0 by the +0.1 translation
    assert pos_acc["min"][0] > -0.25
    assert pos_acc["max"][0] > -pos_acc["min"][0] + 0.15

    stage = export_main(["usd", "--conf", conf, "--exps_folder", exps])
    text = open(stage).read()
    assert 'def Mesh "object_0"' in text
    assert 'def Mesh "object_1"' in text
    assert "PhysicsRigidBodyAPI" in text or "physics" in text

    usdz = export_main(["gs", "--conf", conf, "--exps_folder", exps])
    assert usdz.endswith("scene_gs.usdz") and os.path.getsize(usdz) > 0
