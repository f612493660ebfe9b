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


def _box_room(half=2.0, subdiv=6):
    """Inward-facing box (a room) as a Mesh."""
    import itertools

    lin = np.linspace(-half, half, subdiv)
    verts, faces = [], []
    for axis, sign in itertools.product(range(3), (-1.0, 1.0)):
        base = len(verts)
        for a in lin:
            for b in lin:
                p = np.zeros(3)
                p[axis] = sign * half
                p[(axis + 1) % 3] = a
                p[(axis + 2) % 3] = b
                verts.append(p)
        for i in range(subdiv - 1):
            for j in range(subdiv - 1):
                v0 = base + i * subdiv + j
                v1, v2, v3 = v0 + 1, v0 + subdiv, v0 + subdiv + 1
                faces += [[v0, v1, v2], [v1, v3, v2]]
    return Mesh(np.asarray(verts, np.float32),
                np.asarray(faces, np.int32))


def test_calc_2d_metric_identity_and_offset():
    """Identical meshes -> ~0 depth L1; a shifted reconstruction -> a
    clearly positive error (reference calc_2d_metric semantics,
    eval_geometry.py:222-300)."""
    from holoscene_tpu.utils.eval_geometry import calc_2d_metric

    gt = _box_room()
    out = calc_2d_metric(gt, gt, n_imgs=4, img_res=(64, 64), focal=38.0,
                         seed=0)
    assert out["n_views"] == 4
    assert out["depth_l1"] == pytest.approx(0.0, abs=1e-5)

    shifted = Mesh(gt.vertices + np.array([0.3, 0.0, 0.0], np.float32),
                   gt.faces)
    out2 = calc_2d_metric(shifted, gt, n_imgs=4, img_res=(64, 64),
                          focal=38.0, seed=0)
    assert out2["depth_l1"] > 0.02
    assert out2["depth_l1_cm"] == pytest.approx(out2["depth_l1"] * 100)


def test_calc_2d_metric_unseen_rejection():
    """Views that would see pc_unseen points are rejected: with unseen
    points filling one half of the room, accepted views must still exist
    and the metric must come out finite; with unseen points EVERYWHERE,
    no view is accepted and n_views == 0."""
    from holoscene_tpu.utils.eval_geometry import calc_2d_metric

    gt = _box_room()
    everywhere = np.random.default_rng(0).uniform(
        -2, 2, (512, 3)).astype(np.float32)
    out = calc_2d_metric(gt, gt, pc_unseen=everywhere, n_imgs=3,
                         img_res=(64, 64), focal=38.0, seed=1, max_tries=5)
    assert out["n_views"] == 0 and np.isnan(out["depth_l1"])
