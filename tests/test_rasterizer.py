import numpy as np
import pytest

from holoscene_tpu.ops.rasterizer import (
    BIG_DEPTH,
    rasterize_mesh,
    rasterize_mesh_list,
    subdivide_mesh,
)
from holoscene_tpu.utils.mc import marching_tetrahedra


def _camera(img=64, f=80.0, cam_z=-2.0):
    intr = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1.0]])
    pose = np.eye(4)
    pose[2, 3] = cam_z
    return pose, intr, (img, img)


def _sphere(r=0.5, res=40):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    sp = 2.0 / (res - 1)
    return marching_tetrahedra(sdf, origin=(-1, -1, -1), spacing=(sp,) * 3)


def test_sphere_raster_depth_and_mask():
    verts, faces = _sphere()
    pose, intr, res = _camera()
    out = rasterize_mesh(verts, faces, pose, intr, res)
    mask = np.asarray(out["mask"])
    depth = np.asarray(out["depth"])

    # center pixel hits the sphere front at depth 1.5
    assert mask[32, 32]
    assert depth[32, 32] == pytest.approx(1.5, abs=0.03)
    # corners miss
    assert not mask[0, 0] and not mask[-1, -1]
    assert depth[0, 0] >= BIG_DEPTH * 0.99

    # projected silhouette radius: r_px = f * (r / sqrt(d^2 - r^2)) for a
    # sphere (grazing ray), d=2, r=0.5 -> ~20.6 px
    ys, xs = np.nonzero(mask)
    rad = np.sqrt((ys - 31.5) ** 2 + (xs - 31.5) ** 2).max()
    assert rad == pytest.approx(80 * 0.5 / np.sqrt(4 - 0.25), abs=2.0)


def test_world_pos_on_surface():
    verts, faces = _sphere()
    pose, intr, res = _camera()
    out = rasterize_mesh(verts, faces, pose, intr, res)
    mask = np.asarray(out["mask"])
    wp = np.asarray(out["world_pos"])[mask]
    radii = np.linalg.norm(wp, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.02)
    assert np.abs(radii - 0.5).max() < 0.06


def test_instance_ids_with_occlusion():
    v1, f1 = _sphere(r=0.4)
    v2, f2 = _sphere(r=0.3)
    v2 = v2 + np.array([0.0, 0.0, 1.2])  # second sphere BEHIND the first
    pose, intr, res = _camera()
    out = rasterize_mesh_list([(v1, f1), (v2, f2)], pose, intr, res)
    inst = np.asarray(out["instance_id"])
    assert inst[32, 32] == 0  # front sphere wins the center
    assert (inst == 0).sum() > 0
    # the back sphere is fully occluded at center but may peek nowhere
    # (smaller radius, directly behind) -> no pixel should show id 1
    assert (inst == 1).sum() == 0


def test_instance_ids_side_by_side():
    v1, f1 = _sphere(r=0.3)
    v2, f2 = _sphere(r=0.3)
    v1 = v1 + np.array([-0.45, 0.0, 0.0])
    v2 = v2 + np.array([0.45, 0.0, 0.0])
    pose, intr, res = _camera()
    out = rasterize_mesh_list([(v1, f1), (v2, f2)], pose, intr, res)
    inst = np.asarray(out["instance_id"])
    assert (inst == 0).sum() > 50 and (inst == 1).sum() > 50
    # left half of image shows instance 0, right half instance 1
    assert inst[32, 16] == 0 and inst[32, 48] == 1


def test_bary_interpolation_exact():
    # single triangle facing the camera; interpolate an attribute linearly
    verts = np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]])
    faces = np.array([[0, 1, 2]])
    pose, intr, res = _camera()
    out = rasterize_mesh(verts, faces, pose, intr, res, grid_size=12)
    mask = np.asarray(out["mask"])
    assert mask.sum() > 50
    bary = np.asarray(out["bary"])[mask]
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
    wp = np.asarray(out["world_pos"])[mask]
    # all world positions on the z=0 plane inside the triangle
    np.testing.assert_allclose(wp[:, 2], 0.0, atol=1e-5)
    assert wp[:, 0].min() >= -0.51 and wp[:, 0].max() <= 0.51


def test_subdivide_bounds_edges():
    verts = np.array([[0, 0, 0], [4.0, 0, 0], [0, 4.0, 0]])
    faces = np.array([[0, 1, 2]])
    v2, f2 = subdivide_mesh(verts, faces, max_edge=0.5)
    e = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
    lens = np.linalg.norm(v2[e[:, 0]] - v2[e[:, 1]], axis=1)
    assert lens.max() <= 0.5 + 1e-9
    # area preserved
    def area(v, f):
        a = v[f[:, 1]] - v[f[:, 0]]
        b = v[f[:, 2]] - v[f[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    assert area(v2, f2) == pytest.approx(area(verts, faces), rel=1e-9)


def test_backface_culling():
    # triangle wound away from the camera disappears with culling on
    verts = np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]])
    faces_ccw = np.array([[0, 2, 1]])  # visible winding
    faces_cw = np.array([[0, 1, 2]])
    pose, intr, res = _camera()
    out_front = rasterize_mesh(verts, faces_ccw, pose, intr, res,
                               grid_size=12, cull_backfaces=True)
    out_back = rasterize_mesh(verts, faces_cw, pose, intr, res,
                              grid_size=12, cull_backfaces=True)
    front = int(np.asarray(out_front["mask"]).sum())
    back = int(np.asarray(out_back["mask"]).sum())
    assert (front > 50) != (back > 50)  # exactly one winding survives


def test_big_triangle_renders_hole_free():
    """Coverage guard (VERDICT r1 weak #6): two triangles spanning the whole
    screen must rasterize without holes — auto_subdivide splits them until
    the fragment grid covers every pixel, and face_id maps back to the
    caller's two faces."""
    import numpy as np

    from holoscene_tpu.ops.rasterizer import rasterize_mesh

    # a quad (two huge triangles) at z=2 covering the full frustum
    verts = np.array(
        [[-4, -4, 2.0], [4, -4, 2.0], [4, 4, 2.0], [-4, 4, 2.0]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    res = 64
    intr = np.array([[res / 2, 0, res / 2], [0, res / 2, res / 2],
                     [0, 0, 1]], np.float32)
    out = rasterize_mesh(verts, faces, np.eye(4), intr, (res, res))
    mask = np.asarray(out["mask"])
    assert mask.all(), f"{(~mask).sum()} hole pixels with auto_subdivide"
    fid = np.asarray(out["face_id"])
    assert set(np.unique(fid)) <= {0, 1}
    np.testing.assert_allclose(np.asarray(out["depth"]), 2.0, atol=1e-3)

    # without the guard the same mesh leaves holes (documents the hazard)
    out_raw = rasterize_mesh(
        verts, faces, np.eye(4), intr, (res, res), auto_subdivide=False
    )
    assert not np.asarray(out_raw["mask"]).all()


def test_subdivided_bary_consistent_with_parent_faces():
    """After auto-subdivide, (face_id, bary, pix_verts) must form a
    consistent triple in the CALLER's mesh frame: interpolating the
    original faces' vertices with the reported bary must reproduce
    world_pos (the stage-3 atlas bake does exactly this pairing)."""
    verts = np.array(
        [[-4, -4, 2.0], [4, -4, 2.0], [4, 4, 2.0], [-4, 4, 2.0]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    res = 64
    intr = np.array([[res / 2, 0, res / 2], [0, res / 2, res / 2],
                     [0, 0, 1]], np.float32)
    out = rasterize_mesh(verts, faces, np.eye(4), intr, (res, res))
    mask = np.asarray(out["mask"])
    assert mask.all()
    bary = np.asarray(out["bary"])[mask]
    fid = np.asarray(out["face_id"])[mask]
    wp = np.asarray(out["world_pos"])[mask]
    recon = np.einsum("pk,pkd->pd", bary, verts[faces[fid]])
    np.testing.assert_allclose(recon, wp, atol=1e-4)
    # pix_verts must be the parent triangles' corners
    pv = np.asarray(out["pix_verts"])[mask]
    np.testing.assert_allclose(pv, verts[faces[fid]], atol=1e-6)


def test_depth_peel_sphere_second_surface():
    # a sphere seen from outside: layer 0 = front surface (d - r), layer 1 =
    # BACK surface (d + r), layer 2 empty at the center (reference
    # rasterize_mesh_depth_peeler semantics, utils/general.py:765)
    from holoscene_tpu.ops.rasterizer import rasterize_mesh_peeled

    verts, faces = _sphere()
    pose, intr, res = _camera()
    layers = rasterize_mesh_peeled(verts, faces, pose, intr, res, n_layers=3,
                                   peel_eps=0.05)
    d0 = np.asarray(layers[0]["depth"])
    d1 = np.asarray(layers[1]["depth"])
    assert np.asarray(layers[0]["mask"])[32, 32]
    assert np.asarray(layers[1]["mask"])[32, 32]
    assert d0[32, 32] == pytest.approx(1.5, abs=0.03)
    assert d1[32, 32] == pytest.approx(2.5, abs=0.05)
    assert not np.asarray(layers[2]["mask"])[32, 32]
    # layer 0 must agree with the single-surface rasterizer's front depth
    # (peeled depth is fragment-sampled, not pixel-center-interpolated, so
    # the agreement is to within one fragment-grid cell of surface slope)
    front = np.asarray(rasterize_mesh(verts, faces, pose, intr, res)["depth"])
    m = np.asarray(layers[0]["mask"]) & (front < BIG_DEPTH * 0.5)
    np.testing.assert_allclose(d0[m], front[m], atol=0.05)


def test_depth_peel_single_plane_no_fake_second_layer():
    # one flat quad: fragment-grid depth jitter across its two triangles must
    # NOT resurface it as a second layer (the peel_eps + won-face exclusion)
    from holoscene_tpu.ops.rasterizer import rasterize_mesh_peeled

    verts = np.array([[-0.6, -0.6, 0.0], [0.6, -0.6, 0.0],
                      [0.6, 0.6, 0.0], [-0.6, 0.6, 0.0]])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    pose, intr, res = _camera()
    layers = rasterize_mesh_peeled(verts, faces, pose, intr, res, n_layers=2,
                                   peel_eps=1e-3)
    assert np.asarray(layers[0]["mask"])[32, 32]
    assert np.asarray(layers[1]["mask"]).sum() == 0


def test_depth_peel_list_instance_ids():
    # two spheres in line: the occluded back sphere appears in DEEPER layers
    # with its own instance id (the scene-level occlusion query the reference
    # runs at utils/general.py:2255/2712)
    from holoscene_tpu.ops.rasterizer import rasterize_mesh_list_peeled

    v1, f1 = _sphere(r=0.4)
    v2, f2 = _sphere(r=0.3)
    v2 = v2 + np.array([0.0, 0.0, 1.2])
    pose, intr, res = _camera()
    layers = rasterize_mesh_list_peeled([(v1, f1), (v2, f2)], pose, intr, res,
                                        n_layers=3, peel_eps=0.05)
    inst0 = np.asarray(layers[0]["instance_id"])
    assert inst0[32, 32] == 0 and (inst0 == 1).sum() == 0
    # back sphere front surface sits at z=1.2+2-0.3=2.9, behind the front
    # sphere's BACK surface (2.4) -> it first appears in layer 2
    inst2 = np.asarray(layers[2]["instance_id"])
    assert inst2[32, 32] == 1
    d2 = np.asarray(layers[2]["depth"])
    assert d2[32, 32] == pytest.approx(2.9, abs=0.05)


def test_visible_faces_multiview_prunes_deep_interior():
    # nested spheres: from any orbit view the 4th surface inward sits past a
    # 3-layer peel, so the innermost sphere is pruned and the outer three
    # survive (reference vis_prune keeps any face within the 3 peel layers)
    from holoscene_tpu.ops.rasterizer import (
        prune_invisible_faces,
        visible_faces_multiview,
    )

    shells = [_sphere(r=r, res=24) for r in (0.5, 0.35, 0.1)]
    verts = np.concatenate([v for v, _ in shells])
    offs = np.cumsum([0] + [len(v) for v, _ in shells[:-1]])
    faces = np.concatenate([f + o for (_, f), o in zip(shells, offs)])
    owner = np.concatenate(
        [np.full(len(f), i) for i, (_, f) in enumerate(shells)]
    )
    keep = visible_faces_multiview(
        verts, faces, n_thetas=8, n_layers=2, img_res=(96, 96),
        ortho_half_extent=0.7, peel_eps=0.02,
    )
    # with only 2 peel layers, the innermost sphere (its front surface is
    # layer 2 at center pixels) must vanish; outer shell kept except the
    # polar caps an equatorial-only orbit sees at grazing angles (the
    # reference's vis_prune orbit has the same phi=90 blind spot)
    assert keep[owner == 0].mean() > 0.8
    assert keep[owner == 2].sum() == 0
    v2, f2, vmap, fkeep = prune_invisible_faces(verts, faces, keep)
    assert len(f2) == keep.sum() and f2.min() >= 0 and f2.max() < len(v2)
    # surviving geometry reproduces the kept faces exactly
    np.testing.assert_allclose(v2[f2], verts[faces[keep]])
