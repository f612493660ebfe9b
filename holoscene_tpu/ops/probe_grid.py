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
        # per-axis [M] vectors throughout: any [M, 2/3/8]-minor intermediate
        # pads its minor dim to 128 lanes (the r5d proxy attribution showed
        # the first stacked-weights version spending ~6x the gather cost on
        # exactly that)
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        cx = jnp.clip(px, -bound, bound)
        cy = jnp.clip(py, -bound, bound)
        cz = jnp.clip(pz, -bound, bound)
        oob2 = (px - cx) ** 2 + (py - cy) ** 2 + (pz - cz) ** 2
        ux = (cx + bound) * inv_cell              # [M] in [0, res]
        uy = (cy + bound) * inv_cell
        uz = (cz + bound) * inv_cell
        ix = jnp.clip(ux.astype(jnp.int32), 0, res - 1)
        iy = jnp.clip(uy.astype(jnp.int32), 0, res - 1)
        iz = jnp.clip(uz.astype(jnp.int32), 0, res - 1)
        fx = ux - ix.astype(ux.dtype)
        fy = uy - iy.astype(uy.dtype)
        fz = uz - iz.astype(uz.dtype)
        cid = ix * (res * res) + iy * res + iz
        rt = table[cid].T                         # [M,8] gather -> [8,M]
        gx0, gx1 = 1.0 - fx, fx
        gy0, gy1 = 1.0 - fy, fy
        gz0, gz1 = 1.0 - fz, fz
        # corner c = ix + 2*iy + 4*iz
        val = (gz0 * (gy0 * (gx0 * rt[0] + gx1 * rt[1])
                      + gy1 * (gx0 * rt[2] + gx1 * rt[3]))
               + gz1 * (gy0 * (gx0 * rt[4] + gx1 * rt[5])
                        + gy1 * (gx0 * rt[6] + gx1 * rt[7])))
        return val + jnp.sqrt(oob2 + 1e-20)

    return fn
