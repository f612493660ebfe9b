import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.splat import render_gaussians


def test_render_gaussians_pallas_matches_jax():
    """The Pallas compositing path must reproduce the JAX renderer
    (interpret mode on CPU)."""
    rng = np.random.default_rng(0)
    n = 300
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    quats = jnp.asarray(
        np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1.0]])

    kwargs = dict(
        viewmat=viewmat, intrinsics=intr, width=64, height=64,
        tile_size=16, max_per_tile=128,
    )
    # interpret-mode pallas on CPU
    import holoscene_tpu.ops.splat_pallas as sp
    import functools

    orig = sp.composite_tiles_pallas
    sp_interp = functools.partial(orig, interpret=True)
    sp.composite_tiles_pallas = sp_interp
    try:
        out_p = render_gaussians(
            means, quats, scales, opac, colors, use_pallas=True, **kwargs
        )
    finally:
        sp.composite_tiles_pallas = orig
    out_j = render_gaussians(
        means, quats, scales, opac, colors, use_pallas=False, **kwargs
    )

    np.testing.assert_allclose(
        np.asarray(out_p["rgb"]), np.asarray(out_j["rgb"]), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p["alpha"]), np.asarray(out_j["alpha"]), atol=3e-5
    )
    covered = np.asarray(out_j["alpha"]) > 1e-3
    np.testing.assert_allclose(
        np.asarray(out_p["depth"])[covered],
        np.asarray(out_j["depth"])[covered],
        rtol=1e-3,
    )


def test_render_gaussians_pallas_grads_match_jax():
    """Training through the Pallas path: photometric-loss gradients w.r.t.
    means/scales/opacities/colors must match the JAX compositor."""
    import functools

    import jax

    import holoscene_tpu.ops.splat_pallas as sp

    rng = np.random.default_rng(1)
    n = 120
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.03, 0.08, (n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    kwargs = dict(
        viewmat=viewmat, intrinsics=intr, width=32, height=32,
        tile_size=16, max_per_tile=64,
    )

    def loss(m, s, o, c, use_pallas):
        out = render_gaussians(
            m, quats, s, o, c, use_pallas=use_pallas, **kwargs
        )
        return jnp.mean((out["rgb"] - target) ** 2) + 0.1 * jnp.mean(
            out["alpha"]
        )

    orig = sp.composite_tiles_pallas
    sp.composite_tiles_pallas = functools.partial(orig, interpret=True)
    try:
        g_p = jax.grad(loss, argnums=(0, 1, 2, 3))(
            means, scales, opac, colors, True
        )
    finally:
        sp.composite_tiles_pallas = orig
    g_j = jax.grad(loss, argnums=(0, 1, 2, 3))(
        means, scales, opac, colors, False
    )

    for nm, gp, gj in zip(["means", "scales", "opac", "colors"], g_p, g_j):
        scale = max(1e-3, float(jnp.max(jnp.abs(gj))))
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gj), atol=5e-4 * scale,
            err_msg=f"grad mismatch: {nm}",
        )
        assert float(jnp.max(jnp.abs(gj))) > 0  # non-degenerate test


def test_packed_fetch_matches_split():
    """fetch="packed" (one width-16 payload row gather feeding the Pallas
    compositor) must match fetch="split" exactly, outputs and gradients
    (ops/splat.py render_gaussians)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.ops.splat import render_gaussians

    rng = np.random.default_rng(1)
    n, res = 1500, 48
    means = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.01, 0.06, (n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array([[res * 0.9, 0, res / 2], [0, res * 0.9, res / 2],
                      [0, 0, 1.0]])

    def render(fetch):
        return render_gaussians(
            means, quats, scales, opac, colors, viewmat, intr, width=res,
            height=res, max_per_tile=128, use_pallas=True, fetch=fetch,
        )

    a, b = render("split"), render("packed")
    for key in ["rgb", "alpha"]:
        assert float(jnp.max(jnp.abs(a[key] - b[key]))) < 1e-5

    def loss(m, s, o, c, fetch):
        out = render_gaussians(
            m, quats, s, o, c, viewmat, intr, width=res, height=res,
            max_per_tile=128, use_pallas=True, fetch=fetch,
        )
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["alpha"])

    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors,
                                              "split")
    g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors,
                                              "packed")
    for ga, gb in zip(g1, g2):
        assert float(jnp.max(jnp.abs(ga - gb))) < 1e-4
