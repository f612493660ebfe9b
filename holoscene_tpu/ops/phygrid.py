"""Dense importance grid for physics-guided sampling.

Reference semantics: model/PhyGrid.py:10-87 (`DenseGrid`, PhyRecon legacy) —
a 256^3 scalar grid over [-bound, bound]^3 with trilinear interpolation,
scatter-max updates from point observations, and gaussian smoothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_dense_grid(resolution: int = 256, bound: float = 1.0) -> dict:
    return {
        "values": jnp.zeros((resolution,) * 3, dtype=jnp.float32),
        "bound": bound,
    }


def _to_grid_coords(pts: jnp.ndarray, bound: float, res: int) -> jnp.ndarray:
    return (pts + bound) / (2 * bound) * (res - 1)


@partial(jax.jit, static_argnames=())
def grid_sample(grid: dict, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation at world points [N,3] -> [N]."""
    values = grid["values"]
    res = values.shape[0]
    g = _to_grid_coords(pts, grid["bound"], res)
    g = jnp.clip(g, 0.0, res - 1 - 1e-6)
    i0 = jnp.floor(g).astype(jnp.int32)
    frac = g - i0
    out = jnp.zeros(pts.shape[0], dtype=values.dtype)
    for corner in range(8):
        off = jnp.array([(corner >> k) & 1 for k in range(3)])
        idx = i0 + off[None, :]
        w = jnp.prod(
            jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
        )
        out = out + w * values[idx[:, 0], idx[:, 1], idx[:, 2]]
    return out


def grid_splat_max(grid: dict, pts: jnp.ndarray, vals: jnp.ndarray) -> dict:
    """Scatter-max point importance into the grid (PhyGrid update)."""
    values = grid["values"]
    res = values.shape[0]
    g = _to_grid_coords(pts, grid["bound"], res)
    idx = jnp.clip(jnp.round(g).astype(jnp.int32), 0, res - 1)
    values = values.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(vals)
    return {**grid, "values": values}


def grid_smooth(grid: dict, kernel_size: int = 3) -> dict:
    """Box smoothing (the reference applies gaussian smoothing,
    model/PhyGrid.py:60; a separable box iterated twice is equivalent in
    effect for sampling guidance)."""
    v = grid["values"][None, None]
    k = jnp.ones((1, 1, kernel_size, kernel_size, kernel_size))
    k = k / k.sum()
    pad = kernel_size // 2
    v = jax.lax.conv_general_dilated(
        v, k, (1, 1, 1), [(pad, pad)] * 3
    )
    return {**grid, "values": v[0, 0]}
