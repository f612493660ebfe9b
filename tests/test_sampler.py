import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.sampler import SamplerConfig, error_bound_sample, uniform_sample

CFG = SamplerConfig(
    scene_bounding_sphere=1.0,
    near=0.0,
    N_samples=16,
    N_samples_eval=24,
    N_samples_extra=8,
    eps=0.1,
    beta_iters=6,
    max_total_iters=3,
)


def sphere_sdf(pts):
    """Unit test oracle: sphere of radius 0.5 at origin."""
    return jnp.linalg.norm(pts, axis=-1) - 0.5


def _rays(n=8):
    # rays from z=-2 looking +z, offset in x
    o = jnp.stack(
        [jnp.linspace(-0.3, 0.3, n), jnp.zeros(n), jnp.full((n,), -2.0)], axis=-1
    )
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    return o, d


def test_shapes_and_sorted():
    o, d = _rays()
    z, z_eik = error_bound_sample(
        jax.random.PRNGKey(0), o, d, sphere_sdf, jnp.asarray(0.05), CFG, training=True
    )
    assert z.shape == (8, CFG.n_final)
    assert z_eik.shape == (8, 1)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))
    assert bool(jnp.all(jnp.isfinite(z)))
    # range: within [near, far]
    assert float(z.min()) >= CFG.near - 1e-6
    assert float(z.max()) <= CFG.far + 1e-6


def test_samples_concentrate_near_surface():
    """With a small beta0 the error-bound upsampling must pile samples near
    the first sphere crossing (z = 1.5 for the central ray)."""
    o, d = _rays(n=3)
    z, _ = error_bound_sample(
        jax.random.PRNGKey(1), o, d, sphere_sdf, jnp.asarray(0.02), CFG, training=False
    )
    center = z[1]  # ray through origin: crossings at z=1.5 and 2.5
    near_surface = jnp.sum((jnp.abs(center - 1.5) < 0.15) | (jnp.abs(center - 2.5) < 0.15))
    frac = float(near_surface) / CFG.n_final
    assert frac > 0.25, f"only {frac:.2f} of samples near surface"


def test_eval_mode_deterministic():
    o, d = _rays()
    z1, _ = error_bound_sample(
        jax.random.PRNGKey(0), o, d, sphere_sdf, jnp.asarray(0.05), CFG, training=False
    )
    z2, _ = error_bound_sample(
        jax.random.PRNGKey(42), o, d, sphere_sdf, jnp.asarray(0.05), CFG, training=False
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)


def test_uniform_sampler_stratified_within_bins():
    o, d = _rays()
    near = jnp.zeros((8, 1))
    far = jnp.ones((8, 1)) * 2.0
    z = uniform_sample(jax.random.PRNGKey(0), o, d, 16, near, far, training=True)
    assert z.shape == (8, 16)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1] - 2.0 / 16))
    z_eval = uniform_sample(jax.random.PRNGKey(0), o, d, 16, near, far, training=False)
    np.testing.assert_allclose(np.asarray(z_eval[0]), np.linspace(0, 2, 16), rtol=1e-5)


def test_jit_compiles_once_and_matches_eager():
    o, d = _rays()

    def run(key):
        return error_bound_sample(
            key, o, d, sphere_sdf, jnp.asarray(0.05), CFG, training=False
        )[0]

    eager = run(jax.random.PRNGKey(0))
    jitted = jax.jit(run)(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


def test_merge_sorted_matches_argsort():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from holoscene_tpu.ops.sampler import _merge_sorted

    key = jax.random.PRNGKey(0)
    R, W, E = 7, 33, 12
    z_a = jnp.sort(jax.random.randint(key, (R, W), 0, 40).astype(jnp.float32))
    z_b = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(1), (R, E), 0, 40)
        .astype(jnp.float32)
    )  # integer values force many cross/within duplicates
    s_a = jax.random.normal(jax.random.PRNGKey(2), (R, W))
    s_b = jax.random.normal(jax.random.PRNGKey(3), (R, E))

    z_m, s_m = _merge_sorted(z_a, s_a, z_b, s_b)
    # merged z is ascending and is a permutation of the concat
    assert bool(jnp.all(z_m[:, 1:] >= z_m[:, :-1]))
    np.testing.assert_array_equal(
        np.sort(np.asarray(jnp.concatenate([z_a, z_b], -1)), axis=-1),
        np.asarray(z_m),
    )
    # the (z, sdf) pairing is preserved
    pairs_in = set()
    za, zb = np.asarray(z_a), np.asarray(z_b)
    sa, sb = np.asarray(s_a), np.asarray(s_b)
    for r in range(R):
        pairs_in = {(za[r, i], sa[r, i]) for i in range(W)} | {
            (zb[r, j], sb[r, j]) for j in range(E)
        }
        pairs_out = {
            (float(z_m[r, k]), float(s_m[r, k])) for k in range(W + E)
        }
        assert pairs_out == pairs_in
