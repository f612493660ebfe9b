"""project_gaussians_fused must match covariance_3d + project_gaussians
bit-for-bit in semantics (forward AND gradients) — it is the same math in
scalar-channel layout (ops/gaussians.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from holoscene_tpu.ops.gaussians import (
    covariance_3d,
    project_gaussians,
    project_gaussians_fused,
)


def _scene(n=512, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(
        rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0).at[:3, :3].set(
        jnp.asarray([[0.96, 0.0, 0.28], [0.0, 1.0, 0.0],
                     [-0.28, 0.0, 0.96]], jnp.float32))
    intr = jnp.asarray([[300.0, 0, 256], [0, 300.0, 256], [0, 0, 1]])
    return means, quats, scales, viewmat, intr


def _ref(means, quats, scales, viewmat, intr, ortho=False):
    return project_gaussians(means, covariance_3d(quats, scales), viewmat,
                             intr, 512, 512, ortho=ortho)


def test_fused_projection_matches_reference_forward():
    args = _scene()
    for ortho in (False, True):
        xy, z, conic, radius, valid = _ref(*args, ortho=ortho)
        xy2, z2, conic2, radius2, valid2 = project_gaussians_fused(
            *args, 512, 512, ortho=ortho)
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(conic2), np.asarray(conic),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(radius2), np.asarray(radius),
                                   atol=1.0)  # ceil boundary jitter
        assert (np.asarray(valid2) == np.asarray(valid)).mean() > 0.995


def test_fused_projection_matches_reference_grads():
    means, quats, scales, viewmat, intr = _scene(n=128)

    def loss_ref(m, q, s):
        xy, z, conic, _, _ = _ref(m, q, s, viewmat, intr)
        return jnp.sum(xy * 0.1) + jnp.sum(z) + jnp.sum(conic * 0.01)

    def loss_fused(m, q, s):
        xy, z, conic, _, _ = project_gaussians_fused(
            m, q, s, viewmat, intr, 512, 512)
        return jnp.sum(xy * 0.1) + jnp.sum(z) + jnp.sum(conic * 0.01)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(means, quats, scales)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(means, quats, scales)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
