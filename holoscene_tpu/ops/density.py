"""VolSDF Laplace density: sigma(sdf) = alpha * Laplace(0, beta).CDF(-sdf).

Reference semantics: model/density.py:16-31 —
  density(s) = (1/beta) * (0.5 + 0.5 * sign(s) * expm1(-|s| / beta))
  beta = |beta_param| + beta_min
"""

from __future__ import annotations

import jax.numpy as jnp


def laplace_beta(beta_param: jnp.ndarray, beta_min: float = 1e-4) -> jnp.ndarray:
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Laplace-CDF density. `beta` broadcasts against `sdf`."""
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))
