import numpy as np
import pytest

from holoscene_tpu.stage2.remesh import (
    CoarseReconConfig,
    calc_edges,
    coarse_recon,
    collapse_edges,
    flip_edges,
    icosphere,
    remesh_step,
    split_edges,
)
from holoscene_tpu.stage2.views import wonder3d_camera_rig
from holoscene_tpu.utils.mesh import Mesh


def test_icosphere():
    m = icosphere(radius=0.5, center=(0.1, 0, 0), subdivisions=2)
    r = np.linalg.norm(m.vertices - np.array([0.1, 0, 0]), axis=1)
    np.testing.assert_allclose(r, 0.5, rtol=1e-9)
    assert len(m.faces) == 20 * 16
    # watertight
    edges = np.concatenate([m.faces[:, [0, 1]], m.faces[:, [1, 2]], m.faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_calc_edges():
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    edges, f2e = calc_edges(faces)
    assert len(edges) == 5  # shared edge (0,2) counted once
    assert f2e.shape == (2, 3)


def test_split_and_collapse_roundtrip():
    m = icosphere(subdivisions=1)
    verts, faces = m.vertices, m.faces
    edges, f2e = calc_edges(faces)
    n_faces = len(faces)
    # split every edge of face 0
    mask = np.zeros(len(edges), bool)
    mask[f2e[0]] = True
    v2, f2 = split_edges(verts.copy(), faces, mask, edges, f2e)
    assert len(v2) == len(verts) + 3
    assert len(f2) > n_faces
    # collapse the shortest edges back down
    edges2, _ = calc_edges(f2)
    lengths = np.linalg.norm(v2[edges2[:, 0]] - v2[edges2[:, 1]], axis=1)
    mask2 = lengths < np.quantile(lengths, 0.1)
    v3, f3 = collapse_edges(v2.copy(), f2, mask2, edges2)
    assert len(v3) < len(v2)
    # all faces valid indices
    assert f3.max() < len(v3)


def test_flip_preserves_manifold():
    m = icosphere(subdivisions=1)
    v, f = flip_edges(m.vertices, m.faces)
    assert len(f) == len(m.faces)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)  # still watertight


def test_remesh_step_uniformizes():
    m = icosphere(subdivisions=2)
    # stretch the sphere hard to create non-uniform edges
    v = m.vertices * np.array([4.0, 1.0, 1.0])
    edges, _ = calc_edges(m.faces)
    len_before = np.linalg.norm(v[edges[:, 0]] - v[edges[:, 1]], axis=1)
    target = np.mean(len_before)
    v2, f2 = v, m.faces
    for _ in range(3):
        v2, f2 = remesh_step(v2, f2, target)
    edges2, _ = calc_edges(f2)
    len_after = np.linalg.norm(v2[edges2[:, 0]] - v2[edges2[:, 1]], axis=1)
    assert len_after.std() / len_after.mean() < len_before.std() / len_before.mean()


def test_coarse_recon_recovers_sphere():
    """Render GT views of a sphere mesh, reconstruct from them."""
    gt = icosphere(radius=0.4, subdivisions=2)
    center = np.zeros(3)
    rig = wonder3d_camera_rig(center, 1.5)
    from holoscene_tpu.ops.rasterizer import rasterize_mesh

    views = []
    for pose in rig:
        out = rasterize_mesh(gt.vertices, gt.faces, pose, None, (64, 64),
                             ortho_half_extent=0.7)
        mask = np.asarray(out["mask"])
        tri = np.asarray(out["pix_verts"])
        n = np.cross(tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        n_cam = n @ pose[:3, :3]
        views.append({"pose": pose, "half_extent": 0.7,
                      "normal": n_cam.astype(np.float32),
                      "mask": mask})

    rec = coarse_recon(views, center, 0.5,
                       CoarseReconConfig(iters=120, remesh_every=60, img_res=64))
    r = np.linalg.norm(rec.vertices, axis=1)
    assert abs(float(np.median(r)) - 0.4) < 0.08, f"median radius {np.median(r)}"
    assert len(rec.faces) > 50


def test_coarse_recon_accepts_mismatched_view_resolution():
    """Generated views arrive at the provider's img_size (128/256), not the
    recon raster res — coarse_recon must resample targets instead of
    crashing (the r4a hardware chain failed here: (64,64) vs (128,128))."""
    gt = icosphere(radius=0.4, subdivisions=2)
    center = np.zeros(3)
    rig = wonder3d_camera_rig(center, 1.5)
    from holoscene_tpu.ops.rasterizer import rasterize_mesh

    views = []
    for pose in rig[:3]:
        out = rasterize_mesh(gt.vertices, gt.faces, pose, None, (128, 128),
                             ortho_half_extent=0.7)
        mask = np.asarray(out["mask"])
        tri = np.asarray(out["pix_verts"])
        n = np.cross(tri[..., 1, :] - tri[..., 0, :],
                     tri[..., 2, :] - tri[..., 0, :])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        views.append({"pose": pose, "half_extent": 0.7,
                      "normal": (n @ pose[:3, :3]).astype(np.float32),
                      "mask": mask})

    rec = coarse_recon(views, center, 0.5,
                       CoarseReconConfig(iters=40, remesh_every=30,
                                         img_res=64))
    assert len(rec.faces) > 20
    assert np.isfinite(rec.vertices).all()


def test_coarse_recon_trust_region_on_degenerate_views():
    """Near-empty masks once drove the unclamped recon SGD+momentum to
    +-5000 scene units (the r5 chain's corrupt object 2). The per-step
    trust region must keep vertices inside the views' ortho volume."""
    rng = np.random.default_rng(0)
    center = np.array([0.1, -0.1, 0.0])
    radius = 0.7
    rig = wonder3d_camera_rig(center, 2.0)
    views = []
    for pose in rig[:4]:
        mask = np.zeros((64, 64), np.float32)
        mask[30:33, 30:33] = 1.0  # ~0.2% coverage, inconsistent placement
        n = rng.normal(size=(64, 64, 3)).astype(np.float32)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
        views.append({"pose": pose, "half_extent": 1.0,
                      "normal": n, "mask": mask})
    rec = coarse_recon(views, center, radius,
                       CoarseReconConfig(iters=120, img_res=64))
    v = np.asarray(rec.vertices)
    assert np.isfinite(v).all()
    assert np.abs(v - center).max() <= 2.0 * radius + 1e-5
