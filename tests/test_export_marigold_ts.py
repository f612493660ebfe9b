"""scripts/export_marigold_ts.py: the TorchScript exporter must produce
files that satisfy TorchScriptPriorProvider's contract end-to-end
(the export_wonder3d_ts pattern — structure pinned with a mock pipeline,
the real checkpoint only needed on the box that runs the export)."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_ddim_rows_single_step_is_pure_x0():
    from export_marigold_ts import MockScheduler, ddim_rows

    rows = ddim_rows(MockScheduler(), 1)
    assert len(rows) == 1
    t, a_t, a_prev = rows[0]
    assert t == 999 and 0 < a_t < 1 and a_prev == 1.0


def test_wrapper_depth_and_normal_ranges():
    from export_marigold_ts import build_mock

    img = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        d = build_mock(normals=False, steps=1, size=64)(img)
        n = build_mock(normals=True, steps=2, size=64)(img)
    assert d.shape == (1, 1, 64, 96)
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
    assert n.shape == (1, 3, 64, 96)
    norms = torch.linalg.norm(n[0], dim=0)
    assert float((norms - 1.0).abs().max()) < 1e-3  # unit normals


def test_mock_export_feeds_the_provider(tmp_path):
    """CLI --mock exports -> TorchScriptPriorProvider -> infer_depth/normal
    return the stage-0 contract shapes on an [H,W,3] image."""
    dep = str(tmp_path / "marigold_depth_mock.pt")
    nrm = str(tmp_path / "marigold_normal_mock.pt")
    subprocess.run(
        [sys.executable, "scripts/export_marigold_ts.py", "--mock",
         "--out", dep, "--trace-res", "64"], check=True, cwd=REPO)
    subprocess.run(
        [sys.executable, "scripts/export_marigold_ts.py", "--mock",
         "--normals", "--out", nrm, "--trace-res", "64"],
        check=True, cwd=REPO)

    from holoscene_tpu.stage0.priors import TorchScriptPriorProvider

    provider = TorchScriptPriorProvider(depth_checkpoint=dep,
                                        normal_checkpoint=nrm)
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3))
    depth = provider.infer_depth(img)
    assert depth.shape == (64, 64) and depth.dtype == np.float32
    assert np.isfinite(depth).all()
    normal = provider.infer_normal(img)
    assert normal.shape == (64, 64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(normal, axis=-1), 1.0, atol=1e-3)
