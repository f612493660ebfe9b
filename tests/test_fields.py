import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.models.fields import (
    ImplicitNetworkConfig,
    RenderingNetworkConfig,
    implicit_all_gradients,
    implicit_forward,
    implicit_get_outputs,
    implicit_scene_sdf,
    init_implicit_network,
    init_rendering_network,
    rendering_forward,
)

CFG = ImplicitNetworkConfig(
    feature_vector_size=32,
    d_out=4,
    dims=(32, 32),
    multires=2,
    num_levels=4,
    level_dim=2,
    base_size=4,
    end_size=32,
    logmap=10,
    color_grid_feature=True,
)

RCFG = RenderingNetworkConfig(
    feature_vector_size=32, dims=(32, 32), multires_view=2,
    multires_point=2, multires_normal=2,
)


def test_implicit_forward_shapes():
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.5, maxval=0.5)
    sdf_raw, feats = implicit_forward(params, CFG, x)
    assert sdf_raw.shape == (16, 4)
    assert feats.shape == (16, 32)
    assert bool(jnp.all(jnp.isfinite(sdf_raw)))


def test_geometric_init_signs():
    """Background (object 0) SDF: positive inside the scene (bias +0.9);
    objects: negative near origin... actually objects init to spheres of
    radius ~0.45 -> the origin is *inside* objects => sdf < 0 there, and far
    outside => sdf > 0 (model/network.py:135-144)."""
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    origin = jnp.zeros((1, 3))
    sdf_raw, _ = implicit_forward(params, CFG, origin)
    # background: inside + (positive at origin)
    assert float(sdf_raw[0, 0]) > 0
    # objects: negative at origin (inside the init sphere)
    assert bool(jnp.all(sdf_raw[0, 1:] < 0))

    edge = jnp.array([[0.9, 0.0, 0.0]])
    sdf_edge, _ = implicit_forward(params, CFG, edge)
    # objects: positive outside their ~0.45-radius init sphere
    assert bool(jnp.all(sdf_edge[0, 1:] > 0))


def test_scene_sdf_is_min():
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.5, maxval=0.5)
    raw, _ = implicit_forward(params, CFG, x)
    scene = implicit_scene_sdf(params, CFG, x)
    np.testing.assert_allclose(np.asarray(scene), np.asarray(raw.min(axis=-1)), rtol=1e-6)


def test_get_outputs_gradients_match_fd():
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jnp.array([[0.1, 0.2, 0.3], [0.11, 0.21, 0.31]])
    sdf, feats, grads, semantic, sdf_raw = implicit_get_outputs(params, CFG, x)
    assert grads.shape == (2, 3)
    eps = 1e-3
    for d in range(3):
        dx = jnp.zeros(3).at[d].set(eps)
        s_hi = implicit_scene_sdf(params, CFG, x + dx)
        s_lo = implicit_scene_sdf(params, CFG, x - dx)
        fd = (s_hi - s_lo) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[:, d]), np.asarray(fd), atol=2e-2)


def test_all_gradients_jacfwd_matches_per_object_grad():
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jnp.array([[0.05, -0.1, 0.2]])
    jac = implicit_all_gradients(params, CFG, x)  # [1, K+1, 3]
    assert jac.shape == (1, 5, 3)
    for k in range(4):
        g = jax.grad(
            lambda pt: implicit_forward(params, CFG, pt[None, :])[0][0, k]
        )(x[0])
        np.testing.assert_allclose(np.asarray(jac[0, k]), np.asarray(g), rtol=1e-4, atol=1e-6)


def test_rendering_network():
    params = init_rendering_network(jax.random.PRNGKey(0), RCFG)
    n = 16
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    normals = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    views = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    feats = jax.random.normal(jax.random.PRNGKey(4), (n, 32))
    rgb = rendering_forward(params, RCFG, pts, normals, views, feats)
    assert rgb.shape == (n, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


def test_eikonal_second_order_through_full_network():
    """Training differentiates the eikonal term (built from d sdf/dx) w.r.t.
    all params including hash embeddings."""
    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 3), minval=-0.5, maxval=0.5)

    def eik_loss(p):
        jac = implicit_all_gradients(p, CFG, x)
        return jnp.mean((jnp.linalg.norm(jac, axis=-1) - 1.0) ** 2)

    grads = jax.grad(eik_loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert float(jnp.abs(np.asarray(flat)).sum()) > 0


def test_jvp_get_outputs_matches_vjp():
    from holoscene_tpu.models.fields import implicit_get_outputs_jvp

    params = init_implicit_network(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(9), (8, 3), minval=-0.5,
                           maxval=0.5)
    a = implicit_get_outputs(params, CFG, x)
    b = implicit_get_outputs_jvp(params, CFG, x)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-5)


def test_fused_dual_grid_matches_separate():
    """hash_encode_dual + fused_dual_grid forward must match the two-call
    path exactly (same packed bf16 rounding), including under the training
    backward and the scene-SDF gradient."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.models.fields import (
        ImplicitNetworkConfig,
        implicit_forward,
        implicit_get_outputs,
        init_implicit_network,
    )
    from holoscene_tpu.ops.hashgrid import hash_encode, hash_encode_dual

    cfg = ImplicitNetworkConfig(
        feature_vector_size=32, d_out=4, dims=(32, 32), multires=2,
        num_levels=4, level_dim=2, base_size=4, end_size=32, logmap=10,
        color_grid_feature=True,
    )
    cfg_dual = dataclasses.replace(cfg, fused_dual_grid=True)
    params = init_implicit_network(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=-0.9,
                           maxval=0.9)

    # raw encoder parity
    fa, fb = hash_encode_dual((x + 1) * 0.5, params["grid"],
                              params["color_grid"], cfg.grid_meta)
    np.testing.assert_array_equal(
        np.asarray(fa),
        np.asarray(hash_encode((x + 1) * 0.5, params["grid"], cfg.grid_meta)),
    )
    np.testing.assert_array_equal(
        np.asarray(fb),
        np.asarray(
            hash_encode((x + 1) * 0.5, params["color_grid"], cfg.grid_meta)
        ),
    )

    # full forward parity
    s1, f1 = implicit_forward(params, cfg, x)
    s2, f2 = implicit_forward(params, cfg_dual, x)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # get_outputs (vjp-structured gradient) parity across both configs and
    # vs. a plain jax.grad of the min-SDF
    o1 = implicit_get_outputs(params, cfg, x)
    o2 = implicit_get_outputs(params, cfg_dual, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    g_ref = jax.grad(
        lambda pts: implicit_forward(params, cfg, pts)[0].min(-1).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(o1[2]), np.asarray(g_ref),
                               atol=1e-6)

    # training backward parity (grads w.r.t. params through the whole thing)
    def loss(p, c):
        sdf, feats, grads, sem, raw = implicit_get_outputs(p, c, x)
        return (
            (sdf ** 2).sum() + (feats ** 2).sum()
            + ((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2).sum()
        )

    g1 = jax.grad(lambda p: loss(p, cfg))(params)
    g2 = jax.grad(lambda p: loss(p, cfg_dual))(params)
    fl1 = jax.flatten_util.ravel_pytree(g1)[0]
    fl2 = jax.flatten_util.ravel_pytree(g2)[0]
    np.testing.assert_allclose(np.asarray(fl1), np.asarray(fl2), atol=2e-5)
    assert bool(jnp.all(jnp.isfinite(fl1)))


def test_shift_sdf_raw_disentangles_interiors():
    """reference get_shift_sdf_raw (model/network.py:460-480): inside the
    scene only the winning object stays negative; the winner carries the
    scene SDF; outside points are untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.models.fields import (
        ImplicitNetworkConfig,
        implicit_sdf_raw,
        implicit_shift_sdf_raw,
        init_implicit_network,
    )

    cfg = ImplicitNetworkConfig(
        feature_vector_size=16, d_out=4, dims=(16, 16), multires=2,
        num_levels=3, level_dim=2, base_size=4, end_size=16, logmap=8,
    )
    params = init_implicit_network(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-0.9,
                           maxval=0.9)
    raw = np.asarray(implicit_sdf_raw(params, cfg, x))
    shifted = np.asarray(implicit_shift_sdf_raw(params, cfg, x))
    sdf = raw.min(axis=-1)
    idx = raw.argmin(axis=-1)
    n = len(x)
    # winner carries the scene SDF
    np.testing.assert_allclose(shifted[np.arange(n), idx], sdf, atol=1e-6)
    inside = sdf < 0
    assert inside.any() and (~inside).any()
    # inside: all non-winners pushed to >= -sdf (strictly outside)
    m = np.ones_like(shifted, bool)
    m[np.arange(n), idx] = False
    assert (shifted[inside][m[inside]] >= -sdf[inside].repeat(3) - 1e-6).all()
    # outside points untouched
    np.testing.assert_allclose(shifted[~inside], raw[~inside], atol=1e-6)
