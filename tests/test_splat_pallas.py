import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.splat_pallas import composite_tiles_pallas


def _reference_composite(g_xy, g_conic, g_rgb, g_op, g_z, live, origins,
                         tile_size):
    """The JAX tile-compositing math from ops/splat.py, inline."""
    t, k = g_op.shape
    py, px = np.mgrid[0:tile_size, 0:tile_size]
    pix = np.stack([px.ravel() + 0.5, py.ravel() + 0.5], -1)  # [P, 2]
    pix = origins[:, None, :] + pix[None]  # [T, P, 2]

    d = pix[:, None, :, :] - g_xy[:, :, None, :]  # [T, K, P, 2]
    power = -0.5 * (
        g_conic[..., 0, None] * d[..., 0] ** 2
        + 2 * g_conic[..., 1, None] * d[..., 0] * d[..., 1]
        + g_conic[..., 2, None] * d[..., 1] ** 2
    )
    alpha = np.minimum(0.999, (g_op * live)[..., None] * np.exp(np.minimum(power, 0)))
    alpha = np.where(alpha >= 1 / 255, alpha, 0.0)
    trans = np.cumprod(1 - alpha, axis=1)
    trans = np.concatenate([np.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
    w = alpha * trans  # [T, K, P]
    rgb = np.einsum("tkp,tkc->tpc", w, g_rgb)
    depth = np.einsum("tkp,tk->tp", w, g_z)
    a = w.sum(1)
    return rgb, depth / np.maximum(a, 1e-10), a


def _jnp_reference_composite(g_xy, g_conic, g_rgb, g_op, g_z, live, origins,
                             tile_size):
    """Differentiable jnp twin of _reference_composite (for grad checks)."""
    py, px = np.mgrid[0:tile_size, 0:tile_size]
    pix = np.stack([px.ravel() + 0.5, py.ravel() + 0.5], -1)
    pix = jnp.asarray(origins)[:, None, :] + jnp.asarray(pix)[None]
    d = pix[:, None, :, :] - g_xy[:, :, None, :]
    power = -0.5 * (
        g_conic[..., 0, None] * d[..., 0] ** 2
        + 2 * g_conic[..., 1, None] * d[..., 0] * d[..., 1]
        + g_conic[..., 2, None] * d[..., 1] ** 2
    )
    alpha = jnp.minimum(
        0.999, (g_op * live)[..., None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    alpha = jnp.where(alpha >= 1 / 255, alpha, 0.0)
    trans = jnp.cumprod(1 - alpha, axis=1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], 1)
    w = alpha * trans
    rgb = jnp.einsum("tkp,tkc->tpc", w, g_rgb)
    depth = jnp.einsum("tkp,tk->tp", w, g_z)
    a = w.sum(1)
    return rgb, depth / jnp.maximum(a, 1e-10), a


def test_pallas_composite_backward_matches_autodiff():
    rng = np.random.default_rng(3)
    t, k, ts = 2, 32, 8
    p = ts * ts
    origins = (rng.integers(0, 4, (t, 2)) * ts).astype(np.float32)
    g_xy = origins[:, None, :] + rng.uniform(0, ts, (t, k, 2)).astype(np.float32)
    g_conic = np.zeros((t, k, 3), np.float32)
    g_conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    g_conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    g_rgb = rng.uniform(0, 1, (t, k, 3)).astype(np.float32)
    g_op = rng.uniform(0.2, 0.9, (t, k)).astype(np.float32)
    g_z = np.sort(rng.uniform(0.5, 3.0, (t, k)).astype(np.float32), axis=1)
    live = (rng.uniform(0, 1, (t, k)) > 0.2).astype(np.float32)
    ct_rgb = rng.normal(size=(t, p, 3)).astype(np.float32)
    ct_dep = rng.normal(size=(t, p)).astype(np.float32)
    ct_alp = rng.normal(size=(t, p)).astype(np.float32)

    inputs = tuple(
        jnp.asarray(x) for x in (g_xy, g_conic, g_rgb, g_op, g_z, live)
    )

    def loss(fn, *args):
        rgb, depth, alpha = fn(*args, jnp.asarray(origins), tile_size=ts)
        return (
            jnp.sum(rgb * ct_rgb)
            + jnp.sum(depth * alpha * ct_dep)  # unnormalized depth
            + jnp.sum(alpha * ct_alp)
        )

    pallas_fn = lambda *a, **kw: composite_tiles_pallas(
        *a, **kw, interpret=True
    )
    grads_p = jax.grad(lambda *a: loss(pallas_fn, *a), argnums=range(6))(
        *inputs
    )
    grads_r = jax.grad(
        lambda *a: loss(
            lambda *b, tile_size: _jnp_reference_composite(
                *b, tile_size=tile_size
            ),
            *a,
        ),
        argnums=range(6),
    )(*inputs)

    names = ["xy", "conic", "rgb", "op", "z", "live"]
    for nm, gp, gr in zip(names, grads_p, grads_r):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=2e-4 * scale,
            err_msg=f"grad mismatch: {nm}",
        )


def test_pallas_composite_matches_reference():
    rng = np.random.default_rng(0)
    t, k, ts = 4, 32, 8
    origins = (rng.integers(0, 4, (t, 2)) * ts).astype(np.float32)
    g_xy = origins[:, None, :] + rng.uniform(0, ts, (t, k, 2)).astype(np.float32)
    g_conic = np.zeros((t, k, 3), np.float32)
    g_conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    g_conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    g_rgb = rng.uniform(0, 1, (t, k, 3)).astype(np.float32)
    g_op = rng.uniform(0.2, 0.9, (t, k)).astype(np.float32)
    g_z = np.sort(rng.uniform(0.5, 3.0, (t, k)).astype(np.float32), axis=1)
    live = (rng.uniform(0, 1, (t, k)) > 0.2).astype(np.float32)

    ref_rgb, ref_depth, ref_alpha = _reference_composite(
        g_xy, g_conic, g_rgb, g_op, g_z, live, origins, ts
    )
    rgb, depth, alpha = composite_tiles_pallas(
        jnp.asarray(g_xy), jnp.asarray(g_conic), jnp.asarray(g_rgb),
        jnp.asarray(g_op), jnp.asarray(g_z), jnp.asarray(live),
        jnp.asarray(origins), tile_size=ts, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=2e-5)
    cover = ref_alpha > 1e-3
    np.testing.assert_allclose(
        np.asarray(depth)[cover], ref_depth[cover], atol=1e-3
    )


def test_n_live_prefix_bound_matches_full_walk():
    """Per-tile n_live chunk bound: with dead entries forming a suffix
    (ops/splat.py's approx_max_k layout), bounding the walk to the live
    prefix must reproduce the unbounded composite exactly — values AND
    gradients — including a tile with n_live=0 and one with a multi-chunk
    prefix."""
    rng = np.random.default_rng(7)
    t, k, ts = 3, 384, 8  # 3 K_CHUNK-sized chunks
    p = ts * ts
    origins = (rng.integers(0, 4, (t, 2)) * ts).astype(np.float32)
    g_xy = origins[:, None, :] + rng.uniform(0, ts, (t, k, 2)).astype(np.float32)
    g_conic = np.zeros((t, k, 3), np.float32)
    g_conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    g_conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    g_rgb = rng.uniform(0, 1, (t, k, 3)).astype(np.float32)
    g_op = rng.uniform(0.2, 0.9, (t, k)).astype(np.float32)
    g_z = np.sort(rng.uniform(0.5, 3.0, (t, k)).astype(np.float32), axis=1)
    n_live = np.array([0, 37, 300], np.int32)  # 0, 1, and 3 chunk walks
    live = (np.arange(k)[None, :] < n_live[:, None]).astype(np.float32)

    args = tuple(
        jnp.asarray(x) for x in (g_xy, g_conic, g_rgb, g_op, g_z, live)
    )
    full = composite_tiles_pallas(
        *args, jnp.asarray(origins), tile_size=ts, interpret=True
    )
    bounded = composite_tiles_pallas(
        *args, jnp.asarray(origins), tile_size=ts, interpret=True,
        n_live=jnp.asarray(n_live),
    )
    for f, b in zip(full, bounded):
        np.testing.assert_allclose(np.asarray(b), np.asarray(f), atol=1e-6)
    assert float(jnp.abs(bounded[0][0]).max()) == 0.0  # empty tile renders 0

    ct_rgb = jnp.asarray(rng.normal(size=(t, p, 3)).astype(np.float32))

    def loss(nl, *a):
        rgb, _, alpha = composite_tiles_pallas(
            *a, jnp.asarray(origins), tile_size=ts, interpret=True, n_live=nl
        )
        return jnp.sum(rgb * ct_rgb) + jnp.sum(alpha)

    g_full = jax.grad(lambda *a: loss(None, *a), argnums=range(6))(*args)
    g_bound = jax.grad(
        lambda *a: loss(jnp.asarray(n_live), *a), argnums=range(6)
    )(*args)
    for nm, gf, gb in zip(["xy", "conic", "rgb", "op", "z", "live"],
                          g_full, g_bound):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gf), atol=1e-5, err_msg=nm
        )


def test_early_termination_saturated_tile():
    """With many near-opaque gaussians the tile saturates after a few
    chunks; the early-terminated composite must match the full JAX
    compositor to ~TERM_EPS, and gradients must stay finite with zeros
    for the truncated tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.ops.splat_pallas import composite_tiles_pallas

    T, K, ts = 2, 384, 8
    rng = np.random.default_rng(3)
    g_xy = jnp.asarray(rng.uniform(1.0, 7.0, (T, K, 2)).astype(np.float32))
    g_conic = jnp.asarray(
        np.tile(np.array([0.5, 0.0, 0.5], np.float32), (T, K, 1))
    )
    g_rgb = jnp.asarray(rng.uniform(0, 1, (T, K, 3)).astype(np.float32))
    g_op = jnp.full((T, K), 0.95, jnp.float32)  # saturates in ~handfuls
    g_z = jnp.asarray(
        np.sort(rng.uniform(1, 5, (T, K)).astype(np.float32), axis=1)
    )
    live = jnp.ones((T, K), jnp.float32)
    origins = jnp.zeros((T, 2), jnp.float32)

    rgb_p, depth_p, alpha_p = composite_tiles_pallas(
        g_xy, g_conic, g_rgb, g_op, g_z, live, origins, tile_size=ts,
        interpret=True,
    )
    # reference: plain front-to-back compositing over ALL K
    py, px = jnp.mgrid[0:ts, 0:ts]
    pix = jnp.stack([px.reshape(-1) + 0.5, py.reshape(-1) + 0.5], -1)  # [P,2]
    d = pix[None, :, None, :] - g_xy[:, None, :, :]   # [T,P,K,2]
    power = -0.5 * (
        g_conic[:, None, :, 0] * d[..., 0] ** 2
        + 2 * g_conic[:, None, :, 1] * d[..., 0] * d[..., 1]
        + g_conic[:, None, :, 2] * d[..., 1] ** 2
    )
    a = jnp.minimum(0.999, g_op[:, None, :] * jnp.exp(jnp.minimum(power, 0)))
    a = jnp.where(a >= 1 / 255.0, a, 0.0)
    trans = jnp.cumprod(1 - a + 1e-12, axis=-1) / (1 - a + 1e-12)
    w = a * trans
    rgb_ref = jnp.einsum("tpk,tkc->tpc", w, g_rgb)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_ref),
                               atol=5e-3)

    def loss(op):
        r, dd, al = composite_tiles_pallas(
            g_xy, g_conic, g_rgb, op, g_z, live, origins, tile_size=ts,
            interpret=True,
        )
        return (r ** 2).sum() + (al ** 2).sum()

    g = jax.grad(loss)(g_op)
    assert bool(jnp.all(jnp.isfinite(g)))
    # the far tail (behind saturation) must carry ~zero gradient
    assert float(jnp.abs(g[:, -32:]).max()) < 1e-3


def test_scan_cumprod_mode_matches_log():
    """The transcendental-free lane-rolled cumprod ("scan") must match the
    log-space matmul formulation bit-tight, including partial/zero live
    prefixes and gradients through the custom_vjp (the backward is
    formulation-independent)."""
    from holoscene_tpu.ops.splat_pallas import composite_tiles_pallas

    rng = np.random.default_rng(3)
    T, K, ts = 4, 256, 8
    g_xy = jnp.asarray(rng.uniform(0, ts, (T, K, 2)).astype(np.float32))
    g_conic = jnp.asarray(
        np.stack([np.full((T, K), 0.3), np.zeros((T, K)),
                  np.full((T, K), 0.3)], -1).astype(np.float32)
    )
    g_rgb = jnp.asarray(rng.uniform(0, 1, (T, K, 3)).astype(np.float32))
    g_op = jnp.asarray(rng.uniform(0.2, 0.9, (T, K)).astype(np.float32))
    g_z = jnp.asarray(np.sort(rng.uniform(1, 3, (T, K)), axis=1)
                      .astype(np.float32))
    live = jnp.ones((T, K))
    origins = jnp.zeros((T, 2))
    n_live = jnp.asarray(np.array([K, K // 2, 37, 0], np.float32))

    def run(mode):
        return composite_tiles_pallas(
            g_xy, g_conic, g_rgb, g_op, g_z, live, origins, tile_size=ts,
            interpret=True, n_live=n_live, cumprod_mode=mode,
        )

    for a, b in zip(run("log"), run("scan")):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5

    def loss(op, mode):
        r, _, al = composite_tiles_pallas(
            g_xy, g_conic, g_rgb, op, g_z, live, origins, tile_size=ts,
            interpret=True, n_live=n_live, cumprod_mode=mode,
        )
        return jnp.sum(r ** 2) + jnp.sum(al)

    g1 = jax.grad(lambda o: loss(o, "log"))(g_op)
    g2 = jax.grad(lambda o: loss(o, "scan"))(g_op)
    assert float(jnp.max(jnp.abs(g1 - g2))) < 1e-4


def test_chunk256_matches_default():
    """chunk_size=256 (PERF.md stage-4 lever d) is a pure scheduling change:
    values and gradients must match the default 128-lane walk, in both
    cumprod formulations, including with an n_live prefix bound."""
    rng = np.random.default_rng(11)
    t, k, ts = 2, 384, 8
    p = ts * ts
    origins = (rng.integers(0, 4, (t, 2)) * ts).astype(np.float32)
    g_xy = origins[:, None, :] + rng.uniform(0, ts, (t, k, 2)).astype(np.float32)
    g_conic = np.zeros((t, k, 3), np.float32)
    g_conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    g_conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    g_rgb = rng.uniform(0, 1, (t, k, 3)).astype(np.float32)
    g_op = rng.uniform(0.2, 0.9, (t, k)).astype(np.float32)
    g_z = np.sort(rng.uniform(0.5, 3.0, (t, k)).astype(np.float32), axis=1)
    n_live = np.array([37, 300], np.int32)
    live = (np.arange(k)[None, :] < n_live[:, None]).astype(np.float32)
    args = tuple(
        jnp.asarray(x) for x in (g_xy, g_conic, g_rgb, g_op, g_z, live)
    )
    ct_rgb = jnp.asarray(rng.normal(size=(t, p, 3)).astype(np.float32))

    for mode in ["log", "scan"]:
        def loss(ch, *a, mode=mode):
            rgb, _, alpha = composite_tiles_pallas(
                *a, jnp.asarray(origins), tile_size=ts, interpret=True,
                n_live=jnp.asarray(n_live), cumprod_mode=mode, chunk_size=ch,
            )
            return jnp.sum(rgb * ct_rgb) + jnp.sum(alpha)

        base = composite_tiles_pallas(
            *args, jnp.asarray(origins), tile_size=ts, interpret=True,
            n_live=jnp.asarray(n_live), cumprod_mode=mode, chunk_size=128,
        )
        wide = composite_tiles_pallas(
            *args, jnp.asarray(origins), tile_size=ts, interpret=True,
            n_live=jnp.asarray(n_live), cumprod_mode=mode, chunk_size=256,
        )
        for b, w in zip(base, wide):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(b), atol=5e-6, err_msg=mode
            )
        g128 = jax.grad(lambda *a: loss(128, *a), argnums=range(6))(*args)
        g256 = jax.grad(lambda *a: loss(256, *a), argnums=range(6))(*args)
        for nm, a_, b_ in zip(["xy", "conic", "rgb", "op", "z", "live"],
                              g128, g256):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a_), atol=2e-5,
                err_msg=f"{mode}/{nm}",
            )


def test_edge_tile_saturation_mask_preserves_valid_pixels():
    """img_w/img_h masking zeroes the initial transmittance of out-of-image
    pixels (so edge tiles can early-exit); in-image pixels must be bitwise
    unaffected, and out-of-image pixels must not leak gradient."""
    rng = np.random.default_rng(5)
    t, k, ts = 1, 128, 8
    p = ts * ts
    origins = np.zeros((t, 2), np.float32)
    img_w, img_h = 5, 6  # tile extends past a 5x6 image
    g_xy = rng.uniform(0, ts, (t, k, 2)).astype(np.float32)
    g_conic = np.zeros((t, k, 3), np.float32)
    g_conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    g_conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    g_rgb = rng.uniform(0, 1, (t, k, 3)).astype(np.float32)
    g_op = rng.uniform(0.2, 0.9, (t, k)).astype(np.float32)
    g_z = np.sort(rng.uniform(0.5, 3.0, (t, k)).astype(np.float32), axis=1)
    live = np.ones((t, k), np.float32)
    args = tuple(
        jnp.asarray(x) for x in (g_xy, g_conic, g_rgb, g_op, g_z, live)
    )
    base = composite_tiles_pallas(
        *args, jnp.asarray(origins), tile_size=ts, interpret=True,
    )
    masked = composite_tiles_pallas(
        *args, jnp.asarray(origins), tile_size=ts, interpret=True,
        img_w=img_w, img_h=img_h,
    )
    py, px = np.mgrid[0:ts, 0:ts]
    valid = ((px.ravel() + 0.5 < img_w) & (py.ravel() + 0.5 < img_h))
    for b, m in zip(base, masked):
        np.testing.assert_allclose(
            np.asarray(m)[:, valid], np.asarray(b)[:, valid], atol=1e-6
        )

    # cotangents confined to valid pixels -> identical gradients
    ct = jnp.asarray(
        (rng.normal(size=(t, p, 3)) * valid[None, :, None]).astype(np.float32)
    )

    def loss(use_mask, *a):
        kw = dict(img_w=img_w, img_h=img_h) if use_mask else {}
        rgb, _, _ = composite_tiles_pallas(
            *a, jnp.asarray(origins), tile_size=ts, interpret=True, **kw
        )
        return jnp.sum(rgb * ct)

    g0 = jax.grad(lambda *a: loss(False, *a), argnums=range(6))(*args)
    g1 = jax.grad(lambda *a: loss(True, *a), argnums=range(6))(*args)
    for nm, a_, b_ in zip(["xy", "conic", "rgb", "op", "z", "live"], g0, g1):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), atol=1e-5, err_msg=nm
        )
