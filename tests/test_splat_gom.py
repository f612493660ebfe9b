import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.models.gom import (
    GoMConfig,
    compose_for_export,
    gom_loss,
    gom_means,
    gom_opacities,
    gom_quats,
    gom_scales,
    init_gom_params,
    read_gaussian_ply,
    render_gom,
    seed_gaussians_from_meshes,
    write_gaussian_ply,
)
from holoscene_tpu.ops.gaussians import (
    axis_angle_to_quat,
    quat_multiply,
    quat_to_rotmat,
    rotmat_to_quat,
)
from holoscene_tpu.ops.splat import render_gaussians
from holoscene_tpu.ops.ssim import ssim
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


# ---------------------------------------------------------------------------
# quaternion / rotation math
# ---------------------------------------------------------------------------


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.normal(0, 1, (16, 3)))
    q = axis_angle_to_quat(aa)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, rtol=1e-5
    )
    m = quat_to_rotmat(q)
    q2 = rotmat_to_quat(m)
    # q and -q are the same rotation
    sign = np.sign(np.sum(np.asarray(q) * np.asarray(q2), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, np.asarray(q), atol=1e-5)


def test_quat_multiply_composes_rotations():
    q1 = axis_angle_to_quat(jnp.array([[0.3, 0.0, 0.0]]))
    q2 = axis_angle_to_quat(jnp.array([[0.0, 0.5, 0.0]]))
    m12 = quat_to_rotmat(quat_multiply(q1, q2))
    np.testing.assert_allclose(
        np.asarray(m12[0]),
        np.asarray(quat_to_rotmat(q1)[0] @ quat_to_rotmat(q2)[0]),
        atol=1e-5,
    )


def test_ssim_identity():
    img = jnp.asarray(np.random.default_rng(0).random((32, 32, 3)), jnp.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-6)
    assert float(ssim(img, 1 - img)) < 0.5


# ---------------------------------------------------------------------------
# splat renderer
# ---------------------------------------------------------------------------


def _camera(img=64, f=80.0, cam_z=-2.0):
    intr = jnp.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1.0]])
    viewmat = jnp.eye(4).at[2, 3].set(-cam_z)  # w2c: camera at z=cam_z
    return viewmat, intr, img


def test_single_gaussian_renders_blob():
    viewmat, intr, img = _camera()
    out = render_gaussians(
        means=jnp.array([[0.0, 0.0, 0.0]]),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        scales=jnp.array([[0.1, 0.1, 0.1]]),
        opacities=jnp.array([0.9]),
        colors=jnp.array([[1.0, 0.0, 0.0]]),
        viewmat=viewmat,
        intrinsics=intr,
        width=img,
        height=img,
        max_per_tile=16,
    )
    rgb = np.asarray(out["rgb"])
    alpha = np.asarray(out["alpha"])
    assert alpha[32, 32] > 0.5
    assert rgb[32, 32, 0] > 0.4 and rgb[32, 32, 1] < 0.05
    assert alpha[2, 2] < 1e-3
    # expected depth at center ~ 2.0
    assert float(out["depth"][32, 32]) == pytest.approx(2.0, abs=0.05)


def test_front_to_back_occlusion():
    viewmat, intr, img = _camera()
    out = render_gaussians(
        means=jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
        scales=jnp.full((2, 3), 0.15),
        opacities=jnp.array([0.99, 0.99]),
        colors=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        viewmat=viewmat,
        intrinsics=intr,
        width=img,
        height=img,
        max_per_tile=16,
    )
    rgb = np.asarray(out["rgb"])
    # the red (nearer) gaussian must dominate the center
    assert rgb[32, 32, 0] > 3 * rgb[32, 32, 1]


def test_splat_gradients_flow():
    viewmat, intr, img = _camera(img=32, f=40.0)
    target = jnp.zeros((32, 32, 3)).at[:, :, 2].set(0.5)

    def loss(means):
        out = render_gaussians(
            means=means,
            quats=jnp.array([[1.0, 0, 0, 0]]),
            scales=jnp.array([[0.2, 0.2, 0.2]]),
            opacities=jnp.array([0.8]),
            colors=jnp.array([[0.2, 0.3, 0.9]]),
            viewmat=viewmat,
            intrinsics=intr,
            width=32,
            height=32,
            max_per_tile=8,
        )
        return jnp.mean((out["rgb"] - target) ** 2)

    g = jax.grad(loss)(jnp.array([[0.05, 0.0, 0.0]]))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# GoM model
# ---------------------------------------------------------------------------


def _sphere_mesh(r=0.4, res=24):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - r
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1, -1, -1), spacing=(sp,) * 3)
    return Mesh(v, f)


def test_gom_seed_and_constraints():
    cfg = GoMConfig(sh_degree=1, max_per_tile=64)
    mesh = _sphere_mesh()
    static = seed_gaussians_from_meshes([mesh], area_to_subdivide=1e-2, cfg=cfg)
    n = static["num_gaussians"]
    assert n == len(static["radius"])
    params = init_gom_params(static, cfg)

    means = gom_means(params, static, cfg)
    # initial means = face centroids (2d centroid maps back to 3d centroid)
    np.testing.assert_allclose(
        np.asarray(means), np.asarray(static["tri"].mean(axis=1)), atol=1e-4
    )
    # means stay near the sphere surface
    radii = np.linalg.norm(np.asarray(means), axis=1)
    np.testing.assert_allclose(radii.mean(), 0.4, atol=0.03)

    # scales capped at upper_scale * radius
    params_big = dict(params, scales=params["scales"] + 10.0)
    s = gom_scales(params_big, static, cfg)
    # straight-through at f32 leaves cancellation noise ~|raw|*eps
    limit = cfg.upper_scale * static["xyz_radius"]
    assert bool(jnp.all(s <= limit * 1.01 + 1e-4))

    # quats unit norm
    q = gom_quats(params, static, cfg)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, rtol=1e-4
    )

    # visible-mask opacity gating
    mask = jnp.zeros(n, dtype=bool).at[:5].set(True)
    op = gom_opacities(params, mask)
    assert float(op[:5].min()) > 0.05
    assert float(op[5:].max()) < 1e-5


def test_gom_render_and_loss_and_grads():
    cfg = GoMConfig(sh_degree=1, max_per_tile=64, tile_size=16)
    mesh = _sphere_mesh()
    static = seed_gaussians_from_meshes([mesh], area_to_subdivide=1e-2, cfg=cfg)
    params = init_gom_params(static, cfg)

    pose = jnp.eye(4).at[2, 3].set(-2.0)
    intr = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    bg = jnp.zeros(3)

    batch = {
        "image": jnp.full((32, 32, 3), 0.5),
        "acm": jnp.ones((32, 32)) * 0.5,
        "mesh_depth": jnp.full((32, 32), 1.8),
        "mask": None,
    }

    def loss_fn(p):
        out = render_gom(p, static, cfg, pose, intr, 32, 32, bg)
        losses = gom_loss(out, batch, cfg, with_scale_reg=True,
                          scales_linear=gom_scales(p, static, cfg))
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert bool(jnp.isfinite(loss))
    for k in ("main_loss", "l1", "ssim_loss", "acm_loss", "depth_loss"):
        assert bool(jnp.isfinite(losses[k])), k
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert bool(jnp.all(jnp.isfinite(flat)))
    # every param group gets gradient signal
    for name in ("means_2d", "scales", "opacities", "features_dc"):
        assert float(jnp.abs(jax.flatten_util.ravel_pytree(grads[name])[0]).sum()) > 0, name


def test_gaussian_ply_roundtrip(tmp_path):
    cfg = GoMConfig(sh_degree=1)
    mesh = _sphere_mesh(res=12)
    static = seed_gaussians_from_meshes([mesh], area_to_subdivide=1e-1, cfg=cfg)
    params = init_gom_params(static, cfg)
    g = compose_for_export(params, static, cfg)
    p = str(tmp_path / "g.ply")
    write_gaussian_ply(p, g)
    back = read_gaussian_ply(p)
    np.testing.assert_allclose(back["means"], g["means"], rtol=1e-5)
    np.testing.assert_allclose(back["quats"], g["quats"], rtol=1e-5)
    np.testing.assert_allclose(back["features_rest"], g["features_rest"],
                               atol=1e-6)


import jax.flatten_util  # noqa: E402


def test_gom_render_pallas_path_matches_and_trains():
    """render_gom with cfg.use_pallas=True (interpret on CPU) must match the
    JAX compositor and carry gradients to every param group."""
    cfg = GoMConfig(sh_degree=1, max_per_tile=64, tile_size=16)
    cfg_p = GoMConfig(sh_degree=1, max_per_tile=64, tile_size=16,
                      use_pallas=True)
    mesh = _sphere_mesh()
    static = seed_gaussians_from_meshes([mesh], area_to_subdivide=1e-2, cfg=cfg)
    params = init_gom_params(static, cfg)
    pose = jnp.eye(4).at[2, 3].set(-2.0)
    intr = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    bg = jnp.zeros(3)

    out_j = render_gom(params, static, cfg, pose, intr, 32, 32, bg)
    out_p = render_gom(params, static, cfg_p, pose, intr, 32, 32, bg)
    np.testing.assert_allclose(
        np.asarray(out_p["rgb"]), np.asarray(out_j["rgb"]), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p["accumulation"]), np.asarray(out_j["accumulation"]),
        atol=3e-5,
    )

    batch = {
        "image": jnp.full((32, 32, 3), 0.5),
        "acm": jnp.ones((32, 32)) * 0.5,
        "mesh_depth": jnp.full((32, 32), 1.8),
        "mask": None,
    }

    def loss_fn(p, c):
        out = render_gom(p, static, c, pose, intr, 32, 32, bg)
        return gom_loss(out, batch, c)["loss"]

    g_p = jax.grad(lambda p: loss_fn(p, cfg_p))(params)
    g_j = jax.grad(lambda p: loss_fn(p, cfg))(params)
    for name in ("means_2d", "scales", "opacities", "features_dc"):
        gp = np.asarray(jax.flatten_util.ravel_pytree(g_p[name])[0])
        gj = np.asarray(jax.flatten_util.ravel_pytree(g_j[name])[0])
        scale = max(1e-4, float(np.abs(gj).max()))
        np.testing.assert_allclose(gp, gj, atol=1e-3 * scale, err_msg=name)
        assert np.abs(gj).sum() > 0, name


# ---------------------------------------------------------------------------
# saturation-capped auto max_per_tile
# ---------------------------------------------------------------------------


def test_calibrate_max_per_tile_matches_full_depth():
    """The empirical saturation calibration must pick a K whose render
    matches the FULL-depth render on a dense slab where the geometric p99
    overlap is ~1700 — and must stop early (small K) when the scene's
    footprints are large and saturate immediately
    (ops/splat.py calibrate_max_per_tile)."""
    from holoscene_tpu.ops.splat import (
        auto_max_per_tile,
        calibrate_max_per_tile,
        tile_overlap_counts,
    )

    rng = np.random.default_rng(7)
    n, res = 4000, 64
    # all gaussians in one small slab -> every tile is deep
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
             rng.uniform(-0.05, 0.05, n)], axis=-1,
        ).astype(np.float32)
    )
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    scales = jnp.asarray(
        rng.uniform(0.02, 0.05, (n, 3)).astype(np.float32)
    )
    opac = jnp.asarray(rng.uniform(0.6, 0.95, n).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array([[res * 0.9, 0, res / 2], [0, res * 0.9, res / 2],
                      [0, 0, 1.0]])

    def render(k):
        return render_gaussians(
            means, quats, scales, opac, colors, viewmat, intr,
            width=res, height=res, max_per_tile=int(k), use_pallas=False,
        )["rgb"]

    counts = tile_overlap_counts(means, quats, scales, viewmat, intr,
                                 res, res)
    k_geom = auto_max_per_tile(np.asarray(counts), hi=4096)
    assert k_geom >= 1024  # the scene is genuinely deep
    k = calibrate_max_per_tile(render, hi=k_geom, psnr_thresh=45.0)
    assert k < k_geom, (k, k_geom)

    mse = float(jnp.mean((render(n) - render(k)) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, psnr

    # big-footprint variant: 16x larger gaussians saturate within the first
    # doublings -> calibration must stop well below the geometric bound
    big = jnp.asarray(rng.uniform(0.3, 0.6, (n, 3)).astype(np.float32))

    def render_big(k):
        return render_gaussians(
            means, quats, big, opac, colors, viewmat, intr,
            width=res, height=res, max_per_tile=int(k), use_pallas=False,
        )["rgb"]

    k_big = calibrate_max_per_tile(render_big, hi=4096, psnr_thresh=45.0)
    assert k_big <= 256, k_big
