import numpy as np
import pytest

from holoscene_tpu.utils.eval_geometry import calc_3d_metric, icp_align
from holoscene_tpu.utils.eval_rgb import psnr, ssim
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def test_psnr_golden():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert psnr(a, a) == float("inf")
    assert psnr(a, b) == pytest.approx(20.0, rel=1e-6)  # -10*log10(0.01)


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.9


def _sphere_mesh(r, res=32, center=(0, 0, 0)):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(
        (x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2
    ) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1, -1, -1), spacing=(sp,) * 3)
    return Mesh(v, f)


def test_chamfer_identical_spheres():
    m = _sphere_mesh(0.5)
    metrics = calc_3d_metric(m, m, n_samples=20000, align=False)
    assert metrics["accuracy"] < 0.015
    assert metrics["completion"] < 0.015
    assert metrics["completion_ratio"] > 0.99


def test_chamfer_detects_offset():
    a = _sphere_mesh(0.5)
    b = _sphere_mesh(0.5, center=(0.2, 0, 0))
    m = calc_3d_metric(a, b, n_samples=5000, align=False)
    assert m["accuracy"] > 0.05


def test_icp_recovers_translation():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3))
    t_true = np.array([0.05, -0.03, 0.02])
    src = pts + t_true
    T = icp_align(src, pts, iterations=30, threshold=0.5)
    np.testing.assert_allclose(T[:3, 3], -t_true, atol=5e-3)
    aligned = src @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - pts).max() < 0.02
