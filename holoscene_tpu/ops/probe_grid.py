"""Baked dense probe grid for sampler SDF queries.

Stage-1's error-bound sampler (ops/sampler.py; reference
model/ray_sampler.py:130-287) evaluates the scene SDF at T x R x E probe
points per step purely to PLACE samples — the render then evaluates the
exact fields at the chosen z values. On TPU those probes dominate the
sampler (r5b attribution: ~79 of 86 ms; machinery is ~7 ms): every probe
point pays `sampler_grid_levels x 8` hash-gather rows plus the SDF MLP,
and the gather engine is a fixed-rate row serializer (PERF.md round 1).

This module replaces the probe-time field with a dense voxel proxy baked
from the same coarse SDF on a host-controlled cadence — the amortized-
index idiom the stage-4 flat binning uses (ops/splat_flat.py): placement
reads a slightly stale proxy, the rendered image and every gradient use
CURRENT parameters. One 8-wide block-row gather per (point) replaces
`levels x 8` hashed rows + the MLP, the same one-row-per-cell trick the
dense hash levels ride (ops/hashgrid.py block tables).

Staleness semantics: the proxy only affects WHERE quadrature samples land
(like render_top_m pruning), not which regions receive supervision — the
final sample set always spans [near, far] (near/far columns +
N_samples_extra uniform picks), so unlike the occupancy *restriction*
(PERF.md r4 flagship collapse) no region is ever starved of gradient.
Quality is gated like every placement knob (2500-iter + flagship rows).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def bake_probe_grid(sdf_fn: Callable, res: int, bound: float,
                    chunk: int = 1 << 18) -> jnp.ndarray:
    """Evaluate `sdf_fn` on the (res+1)^3 corner lattice of [-bound,bound]^3
    and pack each cell's 8 corners into one row.

    Returns the block table [res^3, 8] (corner order bit-packed
    ix + 2*iy + 4*iz). Chunked lax.map bounds the bake's live memory; cost
    ~= (res/E_round)^3 probe rounds, amortized over probe_update_every
    steps by the caller."""
    n = res + 1
    axis = jnp.linspace(-bound, bound, n)
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    total = n ** 3
    pad = (-total) % chunk
    pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
    vals = jax.lax.map(sdf_fn, pts.reshape(-1, chunk, 3))
    v = vals.reshape(-1)[:total].reshape(n, n, n)
    corners = [v[ix:ix + res, iy:iy + res, iz:iz + res]
               for iz in (0, 1) for iy in (0, 1) for ix in (0, 1)]
    # stack order above yields index bit-packing ix + 2*iy + 4*iz in axis -1
    return jnp.stack(corners, axis=-1).reshape(res ** 3, 8)


def probe_sdf_fn(table: jnp.ndarray, res: int, bound: float) -> Callable:
    """Closure: pts [M,3] -> proxy SDF [M] — ONE 8-wide row gather +
    trilinear combine per point.

    Outside [-bound,bound]^3 the clamped-cell value is raised by the L2
    distance to the box (1-Lipschitz extension — conservative positive, so
    far-pad probe points read as empty space, matching the hashed field's
    zeroed-OOB behavior in spirit)."""
    inv_cell = res / (2.0 * bound)

    def fn(pts: jnp.ndarray) -> jnp.ndarray:
        clamped = jnp.clip(pts, -bound, bound)
        oob = jnp.sqrt(jnp.sum((pts - clamped) ** 2, axis=-1) + 1e-12) \
            - 1e-6
        u = (clamped + bound) * inv_cell          # [M,3] in [0,res]
        cell = jnp.clip(u.astype(jnp.int32), 0, res - 1)
        frac = u - cell.astype(u.dtype)           # [M,3] in [0,1]
        cid = cell[:, 0] * (res * res) + cell[:, 1] * res + cell[:, 2]
        rows = table[cid]                         # [M,8] one gather row each
        wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)  # [M,2]
        wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
        wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
        # rows are packed ix + 2*iy + 4*iz; weights in the same order:
        # w[c] = wz[iz] * wy[iy] * wx[ix] with c = 4*iz + 2*iy + ix
        w = (wz[:, :, None, None] * wy[:, None, :, None]
             * wx[:, None, None, :]).reshape(-1, 8)
        val = jnp.sum(rows * w, axis=-1)
        return val + jnp.maximum(oob, 0.0)

    return fn
