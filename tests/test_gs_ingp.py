"""Instant-NGP (.ingp) gaussian exporter: schema, round-trip, CLI
(reference threedgrut/export/ingp_exporter.py:27-76)."""

import gzip
import subprocess
import sys

import msgpack
import numpy as np

from holoscene_tpu.export.gs_ingp import (
    export_gaussians_ingp,
    read_gaussians_ingp,
)
from tests.test_gs_usdz import _fake_gaussians


def test_ingp_schema_and_roundtrip(tmp_path):
    g = _fake_gaussians(n=48, sh_bands=15)
    path = str(tmp_path / "g.ingp")
    export_gaussians_ingp(path, g)

    with gzip.open(path, "rb") as f:
        d = msgpack.unpackb(f.read())
    assert d["nre_data"] == {"version": "0.0.1", "model": "mogt"}
    assert d["precision"] == "single"
    assert d["mog_num"] == 48
    assert d["mog_sph_degree"] == 3  # 15 rest coeffs -> degree 3
    assert len(d["mog_positions"]) == 48 * 3 * 4
    assert len(d["mog_features"]) == 48 * (3 + 45) * 4

    back = read_gaussians_ingp(path)
    for k in ("means", "log_scales", "quats", "opacity_logits",
              "features_dc", "features_rest"):
        np.testing.assert_allclose(back[k], g[k], atol=1e-7, err_msg=k)


def test_ingp_half_precision(tmp_path):
    g = _fake_gaussians(n=16)
    path = str(tmp_path / "g.ingp")
    export_gaussians_ingp(path, g, force_half=True)
    with gzip.open(path, "rb") as f:
        d = msgpack.unpackb(f.read())
    assert d["precision"] == "half"
    assert len(d["mog_positions"]) == 16 * 3 * 2
    back = read_gaussians_ingp(path)
    np.testing.assert_allclose(back["means"], g["means"], atol=2e-3)


def test_export_gaussian_artifact_dispatch(tmp_path):
    from holoscene_tpu.export import export_gaussian_artifact
    from holoscene_tpu.export.gs_usdz import read_gaussians_usdz
    from holoscene_tpu.models.gom import read_gaussian_ply

    g = _fake_gaussians(n=16)
    for ext, reader in (
        ("ply", read_gaussian_ply),
        ("usdz", read_gaussians_usdz),
        ("ingp", read_gaussians_ingp),
    ):
        p = export_gaussian_artifact(str(tmp_path / f"g.{ext}"), g)
        back = reader(p)
        means = back["means"] if "means" in back else back["positions"]
        np.testing.assert_allclose(
            np.asarray(means, np.float32), g["means"], atol=2e-3, err_msg=ext
        )


def test_ply_to_ingp_cli(tmp_path):
    from holoscene_tpu.models.gom import read_gaussian_ply, write_gaussian_ply

    g = _fake_gaussians(n=32)
    ply = str(tmp_path / "g.ply")
    write_gaussian_ply(ply, g)
    res = subprocess.run(
        [sys.executable, "-m", "holoscene_tpu.export.gs_ingp", ply],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    back = read_gaussians_ingp(str(tmp_path / "g.ingp"))
    ref = read_gaussian_ply(ply)
    np.testing.assert_allclose(back["means"], ref["means"], atol=1e-6)
    np.testing.assert_allclose(
        back["features_rest"], ref["features_rest"], atol=1e-6
    )
