"""Persistent occupancy grid for Stage-1 sample-range restriction.

TPU-first redesign with no reference counterpart: the reference evaluates
~98 samples/ray every step because its sampler has no cached scene
structure (model/ray_sampler.py:130-287 re-probes the full [near, far]
interval each call). Here a 64^3 min-|SDF| grid is maintained as a free
by-product of the error-bound sampler's probe evaluations (the refined
(z, sdf) buffer it already returns), and each ray's sampling interval is
tightened to the span of cells that can contain surface — so the SAME
sample budget lands where the integrand is, upsample rounds converge
sooner (the sampler's per-round lax.cond skip turns converged rounds into
no-ops), and quadrature quality per sample rises instead of the sample
count.

Safety invariants:
  * the grid stores an ESTIMATE of min |scene SDF| per cell, initialized
    to 0 ("occupied everywhere") — restriction is a no-op until real
    probe evidence arrives;
  * a cell is skippable only when its estimate exceeds a margin of
    max(margin_cells x cell diagonal, beta_margin x beta): the SDF is
    1-Lipschitz, so a single in-cell probe at |sdf| > diag proves no
    surface in the cell, and the beta term keeps the Laplace density tail
    (~exp(-|sdf|/beta)) negligible at the cut;
  * unprobed cells DECAY toward occupied (estimate x decay per update), so
    a region frozen out of sampling is re-probed within ~1/(1-decay)
    updates — geometry that moves into previously-empty space is found;
  * rays whose taps see no occupied cell keep their full interval, and the
    sampler's absolute near/far extra samples are appended regardless
    (ops/sampler.py z_extra), so the background compositing endpoint
    survives any restriction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    resolution: int = 64
    bound: float = 1.0          # grid spans [-bound, bound]^3
    taps: int = 64              # coarse taps per ray for range finding
    margin_cells: float = 1.5   # occupied if est < margin_cells * cell_diag
    beta_margin: float = 4.0    # ... or est < beta_margin * beta
    decay: float = 0.95         # unprobed-cell relaxation toward occupied
    pad_taps: float = 1.0       # interval padding in tap spacings

    @property
    def cell_diag(self) -> float:
        return 2.0 * self.bound * (3.0 ** 0.5) / self.resolution


def init_occ_grid(cfg: OccGridConfig) -> jnp.ndarray:
    """All-zero = occupied everywhere (restriction starts as a no-op)."""
    g = cfg.resolution
    return jnp.zeros((g * g * g,), jnp.float32)


def _cell_index(pts: jnp.ndarray, cfg: OccGridConfig):
    """[M,3] world points -> (flat cell index [M], inside mask [M])."""
    g = cfg.resolution
    x = (pts + cfg.bound) * (g / (2.0 * cfg.bound))
    idx = jnp.floor(x).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    return (idx[:, 0] * g + idx[:, 1]) * g + idx[:, 2], inside


def update_occ_grid(occ: jnp.ndarray, pts: jnp.ndarray, sdf: jnp.ndarray,
                    cfg: OccGridConfig) -> jnp.ndarray:
    """Fold a batch of probe evaluations into the grid.

    pts [M,3], sdf [M] — the sampler's refined buffer points and values
    (already computed; this costs one scatter-min). Probed cells refresh to
    the batch min |sdf| (Lipschitz: true in-cell min >= batch_min - diag,
    absorbed by the margin); unprobed cells decay toward occupied."""
    occ = jax.lax.stop_gradient(occ)
    sdf = jax.lax.stop_gradient(sdf.reshape(-1))
    idx, inside = _cell_index(jax.lax.stop_gradient(pts.reshape(-1, 3)), cfg)
    a = jnp.abs(sdf)
    big = jnp.float32(jnp.inf)
    batch_min = jnp.full(occ.shape, big, occ.dtype).at[
        jnp.where(inside, idx, 0)
    ].min(jnp.where(inside, a, big))
    probed = batch_min < big
    return jnp.where(probed, batch_min, occ * cfg.decay)


def occupied_mask(occ: jnp.ndarray, beta, cfg: OccGridConfig) -> jnp.ndarray:
    """Boolean per-cell occupancy at the current annealing state."""
    margin = jnp.maximum(cfg.margin_cells * cfg.cell_diag,
                         cfg.beta_margin * jnp.asarray(beta))
    return occ < margin


def ray_range(
    occ: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    beta,
    cfg: OccGridConfig,
):
    """Tighten each ray's [near, far] to its occupied span.

    rays_o/rays_d [R,3]; near/far [R,1]. Returns (near' [R,1], far' [R,1])
    with near <= near' <= far' <= far. Taps outside the grid count as
    unoccupied (the scene SDF beyond the bounding sphere is >= the sphere
    clearance by construction); rays with NO occupied tap keep the full
    interval — the conservative fallback, not an empty one."""
    occ = jax.lax.stop_gradient(occ)
    t = jnp.linspace(0.0, 1.0, cfg.taps)[None, :]            # [1, T]
    z = near * (1.0 - t) + far * t                            # [R, T]
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    idx, inside = _cell_index(pts.reshape(-1, 3), cfg)
    vals = jnp.take(occ, idx)
    margin = jnp.maximum(cfg.margin_cells * cfg.cell_diag,
                         cfg.beta_margin * jnp.asarray(beta))
    hot = (vals < margin) & inside
    hot = hot.reshape(z.shape)                                # [R, T]

    any_hot = jnp.any(hot, axis=-1, keepdims=True)            # [R, 1]
    first = jnp.argmax(hot, axis=-1, keepdims=True)           # [R, 1]
    last = (cfg.taps - 1) - jnp.argmax(hot[:, ::-1], axis=-1, keepdims=True)
    spacing = (far - near) / (cfg.taps - 1)
    pad = cfg.pad_taps * spacing
    t0 = jnp.take_along_axis(z, first, axis=-1) - pad
    t1 = jnp.take_along_axis(z, last, axis=-1) + pad
    t0 = jnp.clip(t0, near, far)
    t1 = jnp.clip(t1, near, far)
    near_r = jnp.where(any_hot, t0, near)
    far_r = jnp.where(any_hot, jnp.maximum(t1, t0 + spacing), far)
    return near_r, far_r
