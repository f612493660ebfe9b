import numpy as np
import pytest

from holoscene_tpu.utils.mc import extract_mesh, marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh, read_obj, read_ply, write_obj, write_ply


def sphere_grid(res=48, r=0.6):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    spacing = 2.0 / (res - 1)
    return sdf, (-1.0, -1.0, -1.0), (spacing,) * 3


def test_marching_tetrahedra_sphere_accuracy():
    sdf, origin, spacing = sphere_grid()
    verts, faces = marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert np.abs(radii - 0.6).max() < 0.05

    # surface area ~ 4 pi r^2
    mesh = Mesh(verts, faces)
    area = mesh.face_areas.sum()
    assert area == pytest.approx(4 * np.pi * 0.6 ** 2, rel=0.05)

    # outward orientation: normals align with radial direction
    centers = verts[faces].mean(axis=1)
    dots = np.sum(mesh.face_normals * centers / np.linalg.norm(centers, axis=1, keepdims=True), axis=1)
    assert (dots > 0).mean() > 0.99


def test_marching_tetrahedra_watertight_sphere():
    """Every edge of a closed surface must be shared by exactly 2 faces."""
    sdf, origin, spacing = sphere_grid(res=24)
    verts, faces = marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.999


def test_extract_mesh_with_jax_sdf():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    verts, faces = extract_mesh(sdf_fn, resolution=24, chunk=4096)
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.02)


def test_mesh_components_and_filtering():
    # two disjoint triangles
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [5, 0, 0], [6, 0, 0], [5, 1, 0]], dtype=float)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    mesh = Mesh(verts, faces)
    labels = mesh.connected_components()
    assert len(np.unique(labels)) == 2
    big = Mesh(verts, np.array([[0, 1, 2], [0, 2, 1], [3, 4, 5]]))
    largest = big.largest_component()
    assert len(largest.faces) == 2


def test_ply_roundtrip(tmp_path):
    sdf, origin, spacing = sphere_grid(res=16)
    verts, faces = marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    colors = np.random.default_rng(0).integers(0, 255, (len(verts), 3)).astype(np.uint8)
    mesh = Mesh(verts, faces, vertex_colors=colors)
    p = str(tmp_path / "m.ply")
    write_ply(p, mesh)
    back = read_ply(p)
    np.testing.assert_allclose(back.vertices, verts, atol=1e-5)
    np.testing.assert_array_equal(back.faces, faces)
    np.testing.assert_array_equal(back.vertex_colors, colors)


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=float)
    faces = np.array([[0, 1, 2]])
    uvs = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    p = str(tmp_path / "m.obj")
    write_obj(p, Mesh(verts, faces, uvs=uvs), mtl_name="m.mtl", texture_png="t.png")
    back = read_obj(p)
    np.testing.assert_allclose(back.vertices, verts)
    np.testing.assert_array_equal(back.faces, faces)
    np.testing.assert_allclose(back.uvs, uvs)
    assert (tmp_path / "m.mtl").exists()


def test_surface_sampling():
    sdf, origin, spacing = sphere_grid(res=24)
    verts, faces = marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    mesh = Mesh(verts, faces)
    pts = mesh.sample_surface(2000)
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)


def test_decimate_preserves_shape_and_caps_faces():
    """Vertex-clustering decimation (stage-2 view-machinery stand-ins):
    face count bounded, bbox/surface preserved to cluster-cell accuracy."""
    from holoscene_tpu.utils.mc import marching_tetrahedra

    n = 96
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    verts, faces = marching_tetrahedra(
        sdf, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    m = Mesh(verts, faces)
    d = m.decimate(len(faces) // 8)
    assert 0 < len(d.faces) <= len(faces) // 8
    np.testing.assert_allclose(d.bounds, m.bounds, atol=0.06)
    radii = np.linalg.norm(d.sample_surface(2000), axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.05)
    # under the cap: identity (no copy, no work)
    assert m.decimate(10 * len(faces)) is m


def test_components_vectorized_matches_bruteforce():
    """The pointer-jumping component labels must equal a reference
    union-find on a many-component soup."""
    rng = np.random.default_rng(4)
    verts, faces, truth, off = [], [], [], 0
    for ci in range(7):
        k = int(rng.integers(4, 40))
        v = rng.normal(size=(k + 2, 3)) + ci * 5
        f = np.stack([np.arange(k), np.arange(1, k + 1),
                      np.arange(2, k + 2)], 1)
        verts.append(v)
        faces.append(f + off)
        truth.append(np.full(len(f), ci))
        off += k + 2
    m = Mesh(np.concatenate(verts), np.concatenate(faces))
    lab = m.connected_components()
    truth = np.concatenate(truth)
    assert len(np.unique(lab)) == 7
    for ci in range(7):
        assert len(np.unique(lab[truth == ci])) == 1
