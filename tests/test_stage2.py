import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.stage2.providers import (
    DepthGradientNormalEstimator,
    NullInpaintProvider,
    load_vis_info,
    save_vis_info,
)
from holoscene_tpu.stage2.scene_graph import (
    create_scene_graph_from_meshes,
    pair_mesh_collision,
    points_inside_mesh,
    solve_intersection,
)
from holoscene_tpu.stage2.views import (
    camera_on_sphere,
    find_longest_continuous_azimuth_gap,
    look_at_pose,
    object_view_weights,
    select_best_views,
    wonder3d_camera_rig,
)
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def _sphere(center=(0, 0, 0), r=0.3, res=16):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    c = np.asarray(center)
    sdf = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
    return Mesh(v, f)


# ---------------------------------------------------------------------------
# views
# ---------------------------------------------------------------------------


def test_look_at_points_forward():
    pose = look_at_pose(np.array([0, 0, -2.0]), np.zeros(3))
    fwd = pose[:3, 2]
    np.testing.assert_allclose(fwd, [0, 0, 1], atol=1e-9)
    # orthonormal
    np.testing.assert_allclose(pose[:3, :3] @ pose[:3, :3].T, np.eye(3), atol=1e-9)


def test_camera_on_sphere_looks_at_center():
    center = np.array([0.2, -0.1, 0.3])
    pose = camera_on_sphere(center, 1.5, 0.7, 0.3)
    eye = pose[:3, 3]
    assert np.linalg.norm(eye - center) == pytest.approx(1.5, rel=1e-9)
    fwd = pose[:3, 2]
    np.testing.assert_allclose(fwd, (center - eye) / 1.5, atol=1e-9)


def test_wonder3d_rig_six_views():
    rig = wonder3d_camera_rig(np.zeros(3), 2.0)
    assert len(rig) == 6
    # back view is opposite the front view
    np.testing.assert_allclose(rig[0][:3, 3], -rig[3][:3, 3], atol=1e-9)


def test_view_weights_detect_occlusion():
    obj = _sphere((0, 0, 0), 0.25)
    occluder = _sphere((0.6, 0, 0), 0.3)  # blocks the +x side
    views = [
        camera_on_sphere(np.zeros(3), 2.0, 0.0, 0.0),      # from +x: occluded
        camera_on_sphere(np.zeros(3), 2.0, np.pi, 0.0),    # from -x: clear
    ]
    w = object_view_weights(obj, [occluder], views, img_res=64,
                            ortho_half_extent=0.5)
    assert w[1] > w[0] + 0.2, f"weights {w}"


def test_select_best_views_spread():
    obj = _sphere()
    picks = select_best_views(obj, [], n_views=4, n_azimuth=8, n_elevation=2,
                              img_res=48)
    assert len(picks) == 4
    assert all(w > 0 for _, w in picks)


def test_azimuth_gap():
    az = np.array([0.0, 0.1, 0.2])
    gap_center = find_longest_continuous_azimuth_gap(az)
    # largest gap: from 0.2 around to 2pi -> center ~ pi+0.1
    assert gap_center == pytest.approx(np.pi + 0.1, abs=0.01)


# ---------------------------------------------------------------------------
# scene graph / collision
# ---------------------------------------------------------------------------


def test_points_inside_mesh():
    m = _sphere(r=0.5, res=24)
    pts = np.array([[0, 0, 0], [0.3, 0, 0], [0.9, 0, 0], [0, 0.8, 0]])
    inside = points_inside_mesh(pts, m)
    np.testing.assert_array_equal(inside, [True, True, False, False])


def test_pair_collision_and_push():
    a = _sphere((0.3, 0, 0), 0.3)
    b = _sphere((0, 0, 0), 0.3)  # overlapping
    collides, push, depth = pair_mesh_collision(a, b)
    assert collides and depth > 0
    assert push[0] > 0.5  # push A away from B along +x
    c = _sphere((0.8, 0, 0), 0.15)
    collides2, _, _ = pair_mesh_collision(c, b)
    assert not collides2


def test_scene_graph_from_meshes():
    bg = _sphere(r=0.9, res=20)
    touching = _sphere((0.0, 0.85, 0.0), 0.15)  # touches the bg shell
    floating = _sphere((0.0, 0.0, 0.0), 0.1)  # inside, far from shell
    graph = create_scene_graph_from_meshes([bg, touching, floating],
                                           contact_threshold=0.08)
    assert graph[0]["root"]
    assert graph[1]["parent"] == 0
    assert graph[2]["parent"] == 0  # orphan attached to root


def test_solve_intersection_separates():
    bg = _sphere(r=0.95, res=16)
    a = _sphere((0.1, 0, 0), 0.25, res=20)
    b = _sphere((-0.1, 0, 0), 0.25, res=20)  # overlaps a
    graph = {
        0: {"parent": -1, "dist_to_root": 0},
        1: {"parent": 0, "dist_to_root": 1},
        2: {"parent": 0, "dist_to_root": 1},
    }
    t = solve_intersection([bg, a, b], graph, max_iters=30)
    a2 = a.apply_translation(t[1])
    b2 = b.apply_translation(t[2])
    collides, _, depth = pair_mesh_collision(a2, b2)
    assert (not collides) or depth < 0.02


# ---------------------------------------------------------------------------
# providers
# ---------------------------------------------------------------------------


def test_null_inpaint_fills_mask():
    img = np.zeros((16, 16, 3))
    img[:, :8] = 0.8
    mask = np.zeros((16, 16), dtype=bool)
    mask[4:8, 4:8] = True
    out = NullInpaintProvider().inpaint(img, mask)
    assert np.all(np.isfinite(out))
    assert out[5, 5].mean() > 0.1  # filled from the bright region
    # known pixels unchanged
    np.testing.assert_allclose(out[~mask], img[~mask])


def test_depth_gradient_normals():
    depth = np.tile(np.linspace(1, 2, 16)[None, :], (16, 1))  # slope in x
    n = DepthGradientNormalEstimator().infer_normal(None, depth)
    norms = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    assert np.all(n[..., 0] < 0)  # faces -x (depth grows with +x)
    assert np.all(n[..., 2] < 0)  # faces the camera


def test_vis_info_roundtrip(tmp_path):
    views = [{"pose": np.eye(4), "rgb": np.zeros((4, 4, 3)),
              "normal": np.zeros((4, 4, 3)), "mask": np.ones((4, 4), bool),
              "half_extent": 0.5}]
    p = str(tmp_path / "vis_info_1.pkl")
    save_vis_info(p, views)
    back = load_vis_info(p)
    assert len(back) == 1 and back[0]["half_extent"] == 0.5


def test_integrated_view_coverage_detects_hidden_side():
    """An object seen only from the front has low integrated coverage on
    its back hemisphere (reference weight-map integration,
    holoscene_train_post.py:2023-2413 — not a max over candidates)."""
    import numpy as np

    from holoscene_tpu.stage2.views import (
        integrated_view_coverage,
        look_at_pose,
        training_view_vertex_visibility,
    )
    from tests.test_inpaint_views import _uv_sphere

    sphere = _uv_sphere(np.array([0.0, 0.0, 0.0]), 0.3)
    intr = np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]])
    # cameras only in front (-z side)
    poses = [
        look_at_pose(np.array([dx, 0.0, -1.0]), np.zeros(3))
        for dx in (-0.3, 0.0, 0.3)
    ]
    vis = training_view_vertex_visibility(sphere, [], poses, intr, (64, 64))
    assert 0.2 < vis.mean() < 0.9
    cov_partial, cov_map = integrated_view_coverage(sphere, vis)

    # all-around cameras -> much higher coverage
    poses_full = [
        look_at_pose(
            np.array([np.cos(a), 0.0, np.sin(a)]) * 1.0, np.zeros(3)
        )
        for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ]
    vis_full = training_view_vertex_visibility(
        sphere, [], poses_full, intr, (64, 64)
    )
    cov_full, _ = integrated_view_coverage(sphere, vis_full)
    assert cov_full > cov_partial + 0.2, (cov_partial, cov_full)
