"""Volume rendering integrator (transmittance / alpha compositing).

Reference semantics: model/network.py:1803-1824 (volume_rendering and
occlusion_opacity). Laplace density -> free energy = dist * density,
transmittance = exp(-cumsum(shifted free energy)), weights = alpha * T.
The last interval is padded with 1e10 so the final sample absorbs all
remaining transmittance.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_dists(z_vals: jnp.ndarray, far_pad: float = 1e10) -> jnp.ndarray:
    """[R, S] z values -> [R, S] interval lengths (last padded to far_pad)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    pad = jnp.full_like(dists[..., :1], far_pad)
    return jnp.concatenate([dists, pad], axis=-1)


def volume_render_weights(z_vals: jnp.ndarray, density: jnp.ndarray):
    """Compute compositing weights.

    z_vals:  [R, S]   sorted sample depths per ray
    density: [R, S]   per-sample density
    Returns (weights [R,S], transmittance [R,S], dists [R,S]).
    """
    dists = ray_dists(z_vals)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    weights = alpha * transmittance
    return weights, transmittance, dists


def occlusion_opacity(
    transmittance: jnp.ndarray, dists: jnp.ndarray, obj_density: jnp.ndarray
) -> jnp.ndarray:
    """Occlusion-aware per-object opacity (ObjectSDF++).

    transmittance: [R, S] scene transmittance
    dists:         [R, S]
    obj_density:   [R, S, K] per-object Laplace densities
    Returns object opacity [R, K]: sum_s (1 - exp(-dist*sigma_k)) * T_scene.
    """
    free_energy = dists[..., None] * obj_density
    alpha = 1.0 - jnp.exp(-free_energy)
    object_weight = alpha * transmittance[..., None]
    return object_weight.sum(axis=-2)


def composite(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """weights [R,S], values [R,S,C] -> [R,C]."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def composite_depth(weights: jnp.ndarray, z_vals: jnp.ndarray, eps: float = 1e-8):
    """Expected depth normalized by accumulated weight (reference network.py:822)."""
    acc = weights.sum(axis=-1, keepdims=True)
    return jnp.sum(weights * z_vals, axis=-1, keepdims=True) / (acc + eps)
