import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.ops.density import laplace_beta, laplace_density
from holoscene_tpu.ops.embedder import embedder_out_dim, positional_encoding
from holoscene_tpu.ops.hashgrid import (
    HashGridMeta,
    hash_encode,
    init_hash_embeddings,
)
from holoscene_tpu.ops.rays import get_camera_rays, near_far_from_cube
from holoscene_tpu.ops.volrend import (
    composite,
    occlusion_opacity,
    volume_render_weights,
)


def test_embedder_matches_reference_layout():
    x = jnp.array([[0.1, -0.2, 0.3]])
    out = positional_encoding(x, 2)
    assert out.shape == (1, embedder_out_dim(2, 3))
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.1, -0.2, 0.3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin([0.1, -0.2, 0.3]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos([0.1, -0.2, 0.3]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[0, 9:12]), np.sin([0.2, -0.4, 0.6]), rtol=1e-6
    )


def test_laplace_density_golden():
    beta = laplace_beta(jnp.asarray(0.1), beta_min=1e-4)
    assert float(beta) == pytest.approx(0.1001)
    # density(0) = alpha * 0.5
    d0 = laplace_density(jnp.asarray(0.0), beta)
    assert float(d0) == pytest.approx(0.5 / 0.1001, rel=1e-5)
    # deep inside (sdf << 0): density -> alpha
    dn = laplace_density(jnp.asarray(-10.0), beta)
    assert float(dn) == pytest.approx(1.0 / 0.1001, rel=1e-4)
    # far outside: density -> 0
    dp = laplace_density(jnp.asarray(10.0), beta)
    assert float(dp) == pytest.approx(0.0, abs=1e-6)
    # antisymmetry of CDF: f(s) + f(-s) = alpha
    s = jnp.asarray(0.07)
    assert float(laplace_density(s, beta) + laplace_density(-s, beta)) == pytest.approx(
        1.0 / 0.1001, rel=1e-5
    )


def test_volume_rendering_against_manual_cumprod():
    z = jnp.array([[0.1, 0.4, 0.9, 1.3]])
    density = jnp.array([[0.3, 2.0, 5.0, 1.0]])
    weights, transmittance, dists = volume_render_weights(z, density)

    np.testing.assert_allclose(np.asarray(dists[0, :3]), [0.3, 0.5, 0.4], rtol=1e-6)
    fe = np.asarray(dists) * np.asarray(density)
    t_manual = np.exp(-np.cumsum(np.concatenate([[0.0], fe[0, :-1]])))
    np.testing.assert_allclose(np.asarray(transmittance[0]), t_manual, rtol=1e-5)
    a_manual = 1 - np.exp(-fe[0])
    np.testing.assert_allclose(np.asarray(weights[0]), a_manual * t_manual, rtol=5e-5)
    # last sample's huge padded dist absorbs all transmittance: sum(w) ~= 1
    assert float(weights.sum()) == pytest.approx(1.0, abs=1e-5)


def test_occlusion_opacity_sums_to_scene_weight_for_single_object():
    z = jnp.array([[0.1, 0.4, 0.9, 1.3]])
    density = jnp.array([[0.3, 2.0, 5.0, 1.0]])
    weights, transmittance, dists = volume_render_weights(z, density)
    obj_density = density[..., None]  # one object == the scene
    opac = occlusion_opacity(transmittance, dists, obj_density)
    assert float(opac[0, 0]) == pytest.approx(float(weights.sum()), rel=1e-5)


def test_composite_shapes():
    w = jnp.ones((4, 8)) / 8.0
    vals = jnp.ones((4, 8, 3)) * 2.0
    out = composite(w, vals)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


def test_near_far_from_cube():
    rays_o = jnp.array([[0.0, 0.0, -3.0], [0.0, 5.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])  # second ray misses (y=5)
    near, far = near_far_from_cube(rays_o, rays_d, bound=1.0, min_near=0.0, max_far=10.0)
    assert float(near[0, 0]) == pytest.approx(2.0, abs=1e-5)
    assert float(far[0, 0]) == pytest.approx(4.0, abs=1e-5)
    assert float(near[1, 0]) >= 1e8  # miss -> near=far=1e9, far clamped to max_far
    assert float(far[1, 0]) == pytest.approx(10.0)


def test_camera_rays_center_pixel_points_forward():
    intr = jnp.array([[100.0, 0.0, 64.0], [0.0, 100.0, 64.0], [0.0, 0.0, 1.0]])
    pose = jnp.eye(4)
    uv = jnp.array([[64.0, 64.0], [0.0, 64.0]])
    dirs, cam_loc, depth_scale = get_camera_rays(uv, pose, intr)
    np.testing.assert_allclose(np.asarray(cam_loc), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dirs[0]), [0, 0, 1], atol=1e-6)
    # off-center ray tilts left but z stays positive
    assert float(dirs[1, 0]) < 0 and float(dirs[1, 2]) > 0
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(dirs, axis=-1)), 1.0, rtol=1e-6
    )
    assert float(depth_scale[0, 0]) == pytest.approx(1.0, rel=1e-6)
    assert float(depth_scale[1, 0]) == pytest.approx(float(dirs[1, 2]), rel=1e-5)


# ---------------------------------------------------------------------------
# hash grid
# ---------------------------------------------------------------------------

META = HashGridMeta(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32)


def test_hashgrid_tables():
    res, sizes, offsets = META.level_tables()
    assert res[0] == 4 and res[-1] == 32
    assert sizes[0] == 64  # 4^3 dense
    assert sizes[-1] == 1024  # hashed, capped at 2^10
    assert offsets[0] == 0
    assert META.table_rows == int(sizes.sum())


def test_hashgrid_forward_shapes_and_oob():
    key = jax.random.PRNGKey(0)
    emb = init_hash_embeddings(key, META)
    x = jax.random.uniform(key, (32, 3))
    out = hash_encode(x, emb, META)
    assert out.shape == (32, META.output_dim)
    assert bool(jnp.all(jnp.isfinite(out)))

    x_oob = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
    out_oob = hash_encode(x_oob, emb, META)
    np.testing.assert_allclose(np.asarray(out_oob), 0.0, atol=0)


def test_hashgrid_dense_level_matches_manual_trilinear():
    """Level 0 (4^3 dense) must reproduce hand-computed smoothstep-trilerp
    (packed=False for exact f32; the packed fast path is checked against it
    separately below)."""
    emb = init_hash_embeddings(jax.random.PRNGKey(1), META)
    x = jnp.array([[0.37, 0.11, 0.68]])
    out = hash_encode(x, emb, META, packed=False)[0, :2]  # level-0 features

    scale = 4 - 1.0  # base_resolution - 1 (level 0)
    pos = np.array([0.37, 0.11, 0.68]) * scale
    grid = np.floor(pos).astype(np.int64)
    frac = pos - grid
    w = frac * frac * (3 - 2 * frac)  # smoothstep
    acc = np.zeros(2)
    emb_np = np.asarray(emb)
    for corner in range(8):
        bits = [(corner >> k) & 1 for k in range(3)]
        weight = np.prod([w[d] if bits[d] else 1 - w[d] for d in range(3)])
        cg = grid + np.array(bits)
        idx = cg[0] + 4 * (cg[1] + 4 * cg[2])  # dense stride = resolution
        acc += weight * emb_np[idx % 64]
    np.testing.assert_allclose(np.asarray(out), acc, rtol=1e-5, atol=1e-8)


def test_hashgrid_continuity_across_cell_boundary():
    """smoothstep interpolation => C1 continuity; check values agree across an
    interior grid plane from both sides."""
    emb = init_hash_embeddings(jax.random.PRNGKey(2), META)
    eps = 1e-5
    boundary = 1.0 / 3.0  # grid plane of level 0 (res 4 -> scale 3)
    xa = jnp.array([[boundary - eps, 0.4, 0.4]])
    xb = jnp.array([[boundary + eps, 0.4, 0.4]])
    fa = hash_encode(xa, emb, META)
    fb = hash_encode(xb, emb, META)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-4)


def test_hashgrid_packed_matches_unpacked():
    """The packed bf16-pair gather must match the exact path to bf16
    precision, and its custom-VJP gradient must match exactly (gradients
    scatter in f32)."""
    emb = init_hash_embeddings(jax.random.PRNGKey(4), META)
    x = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))
    f_packed = hash_encode(x, emb, META, packed=True)
    f_exact = hash_encode(x, emb, META, packed=False)
    # init values ~1e-4; bf16 relative error ~0.4%
    np.testing.assert_allclose(
        np.asarray(f_packed), np.asarray(f_exact), atol=2e-6
    )

    def loss_packed(e):
        return (hash_encode(x, e, META, packed=True) ** 2).sum()

    def loss_exact(e):
        return (hash_encode(x, e, META, packed=False) ** 2).sum()

    # the scatter itself is exact f32; the cotangents differ only by the
    # forward bf16 rounding
    g_p = jax.grad(loss_packed)(emb)
    g_e = jax.grad(loss_exact)(emb)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_e), atol=1e-6)


def test_hashgrid_second_order_gradients():
    """Eikonal training differentiates d(output)/d(input) w.r.t. embeddings —
    the reference needed a dedicated CUDA second-backward kernel
    (hashencoder.cu:376-596); here it must 'just work'."""
    emb = init_hash_embeddings(jax.random.PRNGKey(3), META)
    x = jnp.array([[0.3, 0.4, 0.5], [0.7, 0.2, 0.9]])

    def grad_norm_loss(embeddings):
        def f(pt):
            return hash_encode(pt[None, :], embeddings, META).sum()

        g = jax.vmap(jax.grad(f))(x)  # d(features)/d(input)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    g2 = jax.grad(grad_norm_loss)(emb)
    assert g2.shape == emb.shape
    assert bool(jnp.all(jnp.isfinite(g2)))
    assert float(jnp.abs(g2).sum()) > 0


def test_tetrahedral_interp_properties():
    """Kuhn-simplex encoding: partition of unity, exactness on linear
    fields, continuity across cell faces and tet boundaries, and parity
    between hash_encode(interp=...) and hash_encode_dual."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.ops.hashgrid import (
        HashGridMeta,
        _encode_core_tet,
        hash_encode,
        hash_encode_dual,
        init_hash_embeddings,
    )

    META = HashGridMeta(num_levels=3, level_dim=2, base_resolution=4,
                        log2_hashmap_size=8, per_level_scale=2.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (257, 3))

    row, cw, oob, L = _encode_core_tet(x, META)
    assert row.shape == (3, 4, 257) and cw.shape == (3, 4, 257)
    # partition of unity, nonnegative weights
    np.testing.assert_allclose(np.asarray(cw.sum(axis=1)), 1.0, atol=1e-5)
    assert float(cw.min()) >= -1e-6

    # exactness on a linear field: build a DENSE level-0-only grid whose
    # value at grid point (i,j,k) is a + b.(i,j,k); simplex interp of a
    # linear field is exact
    META1 = HashGridMeta(num_levels=1, level_dim=2, base_resolution=4,
                         log2_hashmap_size=10, per_level_scale=2.0)
    res = 4  # scale = 3, resolution 4 -> dense (64 <= 1024)
    ii, jj, kk = np.meshgrid(range(res), range(res), range(res),
                             indexing="ij")
    lin = 0.25 + 0.1 * ii + 0.2 * jj - 0.05 * kk  # value at (i,j,k)
    emb = np.zeros((META1.table_rows, 2), np.float32)
    # dense row-major index: x + r*(y + r*z)
    for i in range(res):
        for j in range(res):
            for k in range(res):
                emb[i + res * (j + res * k)] = lin[i, j, k]
    emb = jnp.asarray(emb)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01,
                            maxval=0.95)
    out = hash_encode(xs, emb, META1, interp="tetrahedral")
    pos = xs * 3.0  # scale = base_res - 1
    expect = 0.25 + 0.1 * pos[:, 0] + 0.2 * pos[:, 1] - 0.05 * pos[:, 2]
    # bf16 packing quantizes the table: tolerance ~1e-2 relative
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(expect),
                               atol=2e-2)

    # continuity: approach a cell face and a tet boundary from both sides
    emb_r = init_hash_embeddings(jax.random.PRNGKey(2), META)
    eps = 1e-5
    probes = jnp.asarray([
        [0.25 - eps, 0.4, 0.6], [0.25 + eps, 0.4, 0.6],   # cell face x
        [0.3, 0.3 - eps, 0.7], [0.3, 0.3 + eps, 0.7],     # tet boundary
    ])
    vals = hash_encode(probes, emb_r, META, interp="tetrahedral")
    np.testing.assert_allclose(np.asarray(vals[0]), np.asarray(vals[1]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(vals[2]), np.asarray(vals[3]),
                               atol=1e-3)

    # dual parity + gradients flow
    emb_b = init_hash_embeddings(jax.random.PRNGKey(3), META)
    fa, fb = hash_encode_dual(x, emb_r, emb_b, META, interp="tetrahedral")
    np.testing.assert_array_equal(
        np.asarray(fa),
        np.asarray(hash_encode(x, emb_r, META, interp="tetrahedral")),
    )
    g = jax.grad(lambda e: (hash_encode(x, e, META,
                                        interp="tetrahedral") ** 2).sum())(
        emb_r)
    assert bool(jnp.all(jnp.isfinite(g)))
    # second order (eikonal-style): grad wrt x of sum, then grad of its norm
    def grad_norm(pts):
        gx = jax.grad(lambda p: hash_encode(p, emb_r, META,
                                            interp="tetrahedral").sum())(pts)
        return (gx ** 2).sum()
    g2 = jax.grad(grad_norm)(x)
    assert bool(jnp.all(jnp.isfinite(g2)))
