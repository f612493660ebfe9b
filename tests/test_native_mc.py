import numpy as np
import pytest

from holoscene_tpu.native import marching_tetrahedra_native
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def sphere_grid(res=32, r=0.6):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r


def test_native_available_and_matches_numpy():
    sdf = sphere_grid(24).astype(np.float32)
    out = marching_tetrahedra_native(sdf)
    if out is None:
        pytest.skip("native build unavailable")
    v_nat, f_nat = out
    sp = 2.0 / 23
    v_np, f_np = marching_tetrahedra(sdf, origin=(0, 0, 0), spacing=(1, 1, 1),
                                     use_native=False)
    # identical welded geometry: same counts and same vertex SET
    assert len(v_nat) == len(v_np)
    assert len(f_nat) == len(f_np)
    a = np.asarray(sorted(map(tuple, np.round(v_nat, 6))))
    b = np.asarray(sorted(map(tuple, np.round(v_np, 6))))
    assert np.array_equal(a, b)


def test_native_path_through_public_api():
    sdf = sphere_grid(64)
    sp = 2.0 / 63
    v, f = marching_tetrahedra(sdf, origin=(-1, -1, -1), spacing=(sp,) * 3)
    radii = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    mesh = Mesh(v, f)
    # watertight
    edges = np.sort(
        np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.999
    # outward orientation
    centers = v[f].mean(axis=1)
    dots = np.sum(
        mesh.face_normals * centers / np.linalg.norm(centers, axis=1,
                                                     keepdims=True), axis=1
    )
    assert (dots > 0).mean() > 0.99


def test_native_speedup_on_large_grid():
    import time

    sdf = sphere_grid(96).astype(np.float32)
    if marching_tetrahedra_native(sdf[:4, :4, :4]) is None:
        pytest.skip("native build unavailable")
    t0 = time.perf_counter()
    marching_tetrahedra(sdf, use_native=True)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    marching_tetrahedra(sdf, use_native=False)
    t_np = time.perf_counter() - t0
    # informational bound: native should not be slower
    assert t_nat < t_np * 1.5, f"native {t_nat:.2f}s vs numpy {t_np:.2f}s"
