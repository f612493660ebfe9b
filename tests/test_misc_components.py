import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.models.cam_opt import (
    apply_camera_optimizer,
    exp_map_so3xr3,
    init_camera_optimizer,
    pose_delta_regularizer,
)
from holoscene_tpu.ops.phygrid import (
    grid_sample,
    grid_smooth,
    grid_splat_max,
    init_dense_grid,
)
from holoscene_tpu.ops.sampler import SamplerConfig, ray_marching_surface


def test_exp_map_identity():
    t = exp_map_so3xr3(jnp.zeros((2, 6)))
    np.testing.assert_allclose(
        np.asarray(t[:, :3, :3]), np.tile(np.eye(3), (2, 1, 1)), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(t[:, :3, 3]), 0.0, atol=1e-7)


def test_exp_map_rotation():
    # rotation of pi/2 around z
    tangent = jnp.array([[0.0, 0, 0, 0, 0, np.pi / 2]])
    t = exp_map_so3xr3(tangent)
    r = np.asarray(t[0, :3, :3])
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_camera_optimizer_apply_and_reg():
    params = init_camera_optimizer(4)
    pose = jnp.eye(4).at[2, 3].set(-2.0)
    out = apply_camera_optimizer(params, pose, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-7)
    assert float(pose_delta_regularizer(params)) == 0.0

    params2 = {"pose_deltas": params["pose_deltas"].at[1, 0].set(0.1)}
    out2 = apply_camera_optimizer(params2, pose, 1)
    assert float(out2[0, 3]) == pytest.approx(0.1, abs=1e-6)
    assert float(pose_delta_regularizer(params2)) > 0


def test_phygrid_roundtrip():
    # res 33 puts these points exactly on voxel centers
    grid = init_dense_grid(resolution=33, bound=1.0)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    grid = grid_splat_max(grid, pts, jnp.array([1.0, 2.0]))
    vals = grid_sample(grid, pts)
    assert float(vals[0]) == pytest.approx(1.0, abs=1e-4)
    assert float(vals[1]) == pytest.approx(2.0, abs=1e-4)
    sm = grid_smooth(grid)
    assert sm["values"].shape == grid["values"].shape
    assert float(sm["values"].max()) < float(grid["values"].max())


def test_ray_marching_surface_sphere():
    cfg = SamplerConfig(scene_bounding_sphere=1.0, near=0.0)

    def sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    o = jnp.array([[0.0, 0.0, -2.0], [0.9, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    depth, hit = ray_marching_surface(jax.random.PRNGKey(0), o, d, sdf, cfg)
    assert bool(hit[0]) and not bool(hit[1])
    assert float(depth[0, 0]) == pytest.approx(1.5, abs=1e-3)
