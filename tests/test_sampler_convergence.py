import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.sampler import SamplerConfig, error_bound_sample


def test_converged_rounds_are_skipped_semantically():
    """With a huge beta0 every ray converges immediately (error bound ~0 at
    beta0), so all upsample rounds skip and the final draw comes from the
    initial uniform buffer — result must still be valid and sorted."""
    cfg = SamplerConfig(N_samples=16, N_samples_eval=24, N_samples_extra=8,
                        beta_iters=4, max_total_iters=3)
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (4, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))

    def sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    calls = {"n": 0}

    def counting_sdf(pts):
        calls["n"] += 1  # trace-time count (upper bound on runtime evals)
        return sdf(pts)

    z_big, _ = error_bound_sample(
        jax.random.PRNGKey(0), o, d, counting_sdf, jnp.asarray(10.0), cfg,
        training=False,
    )
    assert bool(jnp.all(jnp.isfinite(z_big)))
    assert bool(jnp.all(z_big[:, 1:] >= z_big[:, :-1]))

    # small beta0: rounds run; result differs (more refined near surface)
    z_small, _ = error_bound_sample(
        jax.random.PRNGKey(0), o, d, sdf, jnp.asarray(0.02), cfg,
        training=False,
    )
    assert not np.allclose(np.asarray(z_big), np.asarray(z_small))
    near = np.abs(np.asarray(z_small) - 1.5) < 0.1
    near_big = np.abs(np.asarray(z_big) - 1.5) < 0.1
    assert near.sum() >= near_big.sum()
