"""3dgrut-schema USDZ export (VERDICT r1 #8): schema-complete, PLY
round-trip, CLI."""

import gzip
import subprocess
import sys
import zipfile

import numpy as np

from holoscene_tpu.export.gs_usdz import (
    export_from_gaussian_dict,
    export_gaussians_usdz,
    read_gaussians_usdz,
)


def _fake_gaussians(n=64, sh_bands=15):
    rng = np.random.default_rng(0)
    return {
        "means": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "log_scales": rng.uniform(-5, -2, (n, 3)).astype(np.float32),
        "opacity_logits": rng.normal(size=(n,)).astype(np.float32),
        "features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, sh_bands, 3)).astype(np.float32),
    }


def test_usdz_schema_and_roundtrip(tmp_path):
    g = _fake_gaussians()
    path = str(tmp_path / "gauss_obj_1.usdz")
    export_from_gaussian_dict(path, g, sh_degree=3)

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        # USDZ spec: root layer first; stored (uncompressed) members
        assert names[0] == "default.usda"
        assert all(i.compress_type == zipfile.ZIP_STORED for i in z.infolist())

    back = read_gaussians_usdz(path)
    assert back["positions"].shape == (64, 3)
    assert back["rotations"].shape == (64, 4)
    assert back["scales"].shape == (64, 3)
    assert back["densities"].shape == (64, 1)
    assert back["features_albedo"].shape == (64, 3)
    assert back["features_specular"].shape == (64, 45)
    assert back["n_active_features"] == 3
    np.testing.assert_allclose(
        back["positions"].astype(np.float32), g["means"], atol=2e-3
    )
    np.testing.assert_allclose(
        back["features_specular"].astype(np.float32),
        g["features_rest"].transpose(0, 2, 1).reshape(64, -1),
        atol=2e-2,
    )
    # renderer config present (what Kit/Isaac's NuRec loader reads)
    cfg = back["config"]
    assert cfg["layers"]["gaussians"]["name"] == "sh-gaussians"
    assert cfg["renderer"]["name"] == "3dgut-nrend"
    # the usda layer wires the NuRec volume to the payload
    usda = back["gauss_usda"]
    assert "omni:nurec:isNuRecVolume" in usda
    assert "OmniNuRecFieldAsset" in usda
    assert ".nurec@" in usda


def test_ply_to_usdz_cli(tmp_path):
    from holoscene_tpu.models.gom import read_gaussian_ply, write_gaussian_ply

    g = _fake_gaussians(n=32)
    ply = str(tmp_path / "g.ply")
    write_gaussian_ply(ply, g)
    res = subprocess.run(
        [sys.executable, "-m", "holoscene_tpu.export.gs_usdz", ply],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    out = str(tmp_path / "g.usdz")
    back = read_gaussians_usdz(out)
    ref = read_gaussian_ply(ply)
    np.testing.assert_allclose(
        back["positions"].astype(np.float32), ref["means"], atol=2e-3
    )
