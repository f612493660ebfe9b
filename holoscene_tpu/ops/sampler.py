"""VolSDF error-bound ray sampling (Algorithm 1), static-shape TPU version.

Reference semantics: model/ray_sampler.py:105-287 (`ErrorBoundSampler`).

The reference's data-dependent while-loop ("run until every ray's opacity
error bound is under eps, at most T iterations") is re-formulated for XLA as
a fixed unroll of T rounds with per-ray beta bookkeeping:

  * every round evaluates the SDF only on that round's new samples and
    merges them (sorted) into a growing fixed-width z buffer — widths are
    static per round: E, 2E, ..., T*E (E = N_samples_eval);
  * rounds 1..T-1 upsample N_samples_eval points from the per-section error
    bound PDF; round T draws the final N_samples from the compositing
    weights PDF;
  * converged rays (error <= eps at beta0) keep beta = beta0 exactly as in
    the reference (ray_sampler.py:183), so their extra rounds only refine
    the already-fine sample set.

This matches the reference's behavior whenever at least one ray in the batch
hasn't converged (the common case at batch 1024 — the reference's loop exit
is global, not per-ray); the deterministic cost equals the reference's
worst case, which is the right trade for TPU (no recompilation, no host
round-trips).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from holoscene_tpu.ops.density import laplace_density
from holoscene_tpu.ops.rays import near_far_from_cube


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    scene_bounding_sphere: float = 1.0
    near: float = 0.0
    N_samples: int = 64
    N_samples_eval: int = 128
    N_samples_extra: int = 32
    eps: float = 0.1
    beta_iters: int = 10
    max_total_iters: int = 5
    add_tiny: float = 1e-6

    @property
    def far(self) -> float:
        # ray_sampler.py:110: far = 2 * 1.75 * bounding sphere
        return 2.0 * self.scene_bounding_sphere * 1.75

    @property
    def n_final(self) -> int:
        # final z set: N_samples + near + far + N_samples_extra (sorted)
        return self.N_samples + 2 + self.N_samples_extra

    @classmethod
    def from_conf(cls, conf, scene_bounding_sphere: float) -> "SamplerConfig":
        return cls(
            scene_bounding_sphere=scene_bounding_sphere,
            near=conf.get_float("near", 0.0),
            N_samples=conf.get_int("N_samples", 64),
            N_samples_eval=conf.get_int("N_samples_eval", 128),
            N_samples_extra=conf.get_int("N_samples_extra", 32),
            eps=conf.get_float("eps", 0.1),
            beta_iters=conf.get_int("beta_iters", 10),
            max_total_iters=conf.get_int("max_total_iters", 5),
        )


def _searchsorted_batched(cdf: jnp.ndarray, u: jnp.ndarray,
                          side: str = "right") -> jnp.ndarray:
    """Per-row searchsorted(cdf[i], u[i]). cdf [R,S], u [R,N].

    method="compare_all" — at sampler shapes ([1024, ~640] x ~128 queries)
    the one-shot broadcast compare measured 100x faster on v5e than the
    default sequential-gather "scan" method (23.8 ms -> 0.2 ms,
    scripts/profile_phases3.py).
    """
    return jax.vmap(
        partial(jnp.searchsorted, side=side, method="compare_all")
    )(cdf, u)


def _sample_pdf(bins: jnp.ndarray, cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Invert a per-ray CDF (ray_sampler.py:241-253).

    bins [R,S] (z values), cdf [R,S] (prepended 0 -> len S), u [R,N].
    """
    inds = _searchsorted_batched(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, below, axis=-1)
    bin_hi = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def _merge_sorted(z_a, s_a, z_b, s_b):
    """Merge two per-row ASCENDING (z, sdf) pairs into one ascending pair.

    Replaces concat+argsort with two searchsorteds + two scatters: the
    merged position of a[i] is i + #{b < a[i]}, of b[j] is j + #{a <= b[j]}
    (tie-break keeps a first -> positions are collision-free). O(W) instead
    of a bitonic O(W log^2 W) sort.
    """
    R, W = z_a.shape
    E = z_b.shape[1]
    pos_a = jnp.arange(W)[None, :] + _searchsorted_batched(z_b, z_a, "left")
    pos_b = jnp.arange(E)[None, :] + _searchsorted_batched(z_a, z_b, "right")
    rows = jnp.arange(R)[:, None]
    z_m = jnp.zeros((R, W + E), z_a.dtype)
    z_m = z_m.at[rows, pos_a].set(z_a).at[rows, pos_b].set(z_b)
    s_m = jnp.zeros((R, W + E), s_a.dtype)
    s_m = s_m.at[rows, pos_a].set(s_a).at[rows, pos_b].set(s_b)
    return z_m, s_m


def _d_star(z_vals: jnp.ndarray, sdf: jnp.ndarray) -> jnp.ndarray:
    """Theorem-1 minimum-distance bound per section (ray_sampler.py:165-178).

    z_vals, sdf: [R, S]. Returns d_star [R, S-1].
    """
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    a = dists
    b = jnp.abs(sdf[:, :-1])
    c = jnp.abs(sdf[:, 1:])
    first = a ** 2 + b ** 2 <= c ** 2
    second = a ** 2 + c ** 2 <= b ** 2
    s = (a + b + c) / 2.0
    area_sq = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
    h = 2.0 * jnp.sqrt(area_sq) / (a + 1e-12)
    d = jnp.where(first, b, jnp.where(second, c, jnp.where(b + c - a > 0, h, 0.0)))
    same_sign = jnp.sign(sdf[:, 1:]) * jnp.sign(sdf[:, :-1]) == 1
    return jnp.where(same_sign, d, 0.0)


def _error_bound(beta, sdf, z_vals, dists, d_star):
    """Max per-ray opacity error bound (ray_sampler.py:450-458).

    beta: [R,1] or scalar; sdf, z_vals: [R,S]; dists, d_star: [R,S-1].
    """
    density = laplace_density(sdf, beta)
    shifted = jnp.concatenate(
        [jnp.zeros_like(z_vals[:, :1]), dists * density[:, :-1]], axis=-1
    )
    integral = jnp.cumsum(shifted, axis=-1)
    err_sec = jnp.exp(-d_star / beta) * dists ** 2 / (4.0 * beta ** 2)
    err_int = jnp.cumsum(err_sec, axis=-1)
    bound = (jnp.clip(jnp.exp(err_int), max=1e6) - 1.0) * jnp.exp(-integral[:, :-1])
    return bound.max(axis=-1)


def error_bound_sample(
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    beta0: jnp.ndarray,
    cfg: SamplerConfig,
    training: bool = True,
    near: jnp.ndarray | None = None,
    far: jnp.ndarray | None = None,
    return_aux: bool = False,
):
    """Sample z values along each ray with VolSDF's error-bounded scheme.

    rays_o/rays_d: [R,3]; sdf_fn: [M,3] -> [M] scene SDF (evaluated without
    gradient flow — callers pass a stop_gradient'ed closure, matching the
    reference's torch.no_grad at ray_sampler.py:150).
    Returns (z_vals [R, n_final] sorted, z_eik [R, 1] random near-surface z).
    With return_aux=True additionally returns (z_buf [R,W], sdf_buf [R,W],
    beta [R]) — the refined probe buffer, which renderers can use to estimate
    per-sample compositing weights without extra SDF evaluations.
    """
    R = rays_o.shape[0]
    E = cfg.N_samples_eval
    T = cfg.max_total_iters
    k_strat, k_u, k_extra, k_eik = jax.random.split(key, 4)

    # ---- uniform init (UniformSampler.get_z_vals, ray_sampler.py:63-83) ----
    if near is None or far is None:
        _, far_cube = near_far_from_cube(
            rays_o, rays_d, bound=cfg.scene_bounding_sphere,
            min_near=cfg.near, max_far=cfg.far,
        )
        near = jnp.full((R, 1), cfg.near)
        far = far_cube
    t_vals = jnp.linspace(0.0, 1.0, E)[None, :]
    z_vals = near * (1.0 - t_vals) + far * t_vals
    if training:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t_rand = jax.random.uniform(k_strat, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand

    # Constant-width buffer: W = T*E slots from the start, padded with
    # duplicates of the true far sample (zero-width sections contribute
    # nothing to transmittance or error bounds), so the T-1 upsampling
    # rounds are ONE lax.scan body instead of an unrolled python loop — this
    # keeps the traced HLO ~T x smaller, which dominates TPU compile time.
    W = T * E
    far_pts = rays_o + far * rays_d  # [R, 3]
    init_pts = jnp.concatenate(
        [
            (rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :])
            .reshape(-1, 3),
            far_pts,
        ],
        axis=0,
    )
    sdf_all = sdf_fn(init_pts)
    sdf0 = sdf_all[: R * E].reshape(R, E)
    sdf_far = sdf_all[R * E :].reshape(R, 1)

    z_buf = jnp.concatenate(
        [z_vals, jnp.broadcast_to(far, (R, W - E))], axis=-1
    )
    sdf_buf = jnp.concatenate(
        [sdf0, jnp.broadcast_to(sdf_far, (R, W - E))], axis=-1
    )

    # Lemma-2 initial beta upper bound (ray_sampler.py:138-140)
    dists0 = z_buf[:, 1:] - z_buf[:, :-1]
    bound = (1.0 / (4.0 * jnp.log(jnp.asarray(cfg.eps + 1.0)))) * (dists0 ** 2).sum(-1)
    beta_init = jnp.sqrt(bound)  # [R]

    def refine_beta(z_vals, sdf, beta):
        """Per-ray beta bisection (ray_sampler.py:182-190)."""
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        d_star = _d_star(z_vals, sdf)
        err_at_b0 = _error_bound(beta0, sdf, z_vals, dists, d_star)
        beta = jnp.where(err_at_b0 <= cfg.eps, beta0, beta)

        def bisect(_, carry):
            beta_min, beta_max = carry
            beta_mid = 0.5 * (beta_min + beta_max)
            err = _error_bound(beta_mid[:, None], sdf, z_vals, dists, d_star)
            beta_max = jnp.where(err <= cfg.eps, beta_mid, beta_max)
            beta_min = jnp.where(err > cfg.eps, beta_mid, beta_min)
            return beta_min, beta_max

        _, beta = jax.lax.fori_loop(
            0, cfg.beta_iters, bisect, (jnp.full((R,), beta0), beta)
        )
        return beta, dists, d_star

    def weights_of(z_vals, sdf, beta, dists):
        density = laplace_density(sdf, beta[:, None])
        dists_pad = jnp.concatenate(
            [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1
        )
        free_energy = dists_pad * density
        shifted = jnp.concatenate(
            [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1
        )
        alpha = 1.0 - jnp.exp(-free_energy)
        transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
        return alpha * transmittance, transmittance

    def upsample_round(carry, _):
        z_vals, sdf, beta = carry
        beta, dists, d_star = refine_beta(z_vals, sdf, beta)

        # the reference exits its loop when every ray's beta reached beta0
        # (ray_sampler.py:204 `not_converge = beta.max() > beta0`); here the
        # expensive part of a converged round is skipped with lax.cond —
        # free once beta anneals down in real training
        not_converged = jnp.any(beta > beta0 * (1.0 + 1e-6))

        def do_round(operand):
            z_vals, sdf, beta, dists, d_star = operand
            _, transmittance = weights_of(z_vals, sdf, beta, dists)

            # upsample from error-bound PDF (ray_sampler.py:207-219)
            err_sec = (
                jnp.exp(-d_star / beta[:, None]) * dists ** 2
                / (4.0 * beta[:, None] ** 2)
            )
            err_int = jnp.cumsum(err_sec, axis=-1)
            bound_op = (
                jnp.clip(jnp.exp(err_int), max=1e6) - 1.0
            ) * transmittance[:, :-1]
            pdf = bound_op + cfg.add_tiny
            pdf = pdf / pdf.sum(axis=-1, keepdims=True)
            cdf = jnp.concatenate(
                [jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, axis=-1)], axis=-1
            )
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, E)[None, :], (R, E))
            new_samples = _sample_pdf(z_vals, cdf, u)

            new_sdf = sdf_fn(
                (rays_o[:, None, :]
                 + new_samples[..., None] * rays_d[:, None, :]).reshape(-1, 3)
            ).reshape(R, -1)
            # merge (both ascending); keeping the first W slots drops E of
            # the far-duplicate pads, matching the argsort-truncate of the
            # reference formulation
            z_m, s_m = _merge_sorted(z_vals, sdf, new_samples, new_sdf)
            return z_m[:, :W], s_m[:, :W]

        def skip_round(operand):
            z_vals, sdf, *_ = operand
            return z_vals, sdf

        z_vals, sdf = jax.lax.cond(
            not_converged, do_round, skip_round,
            (z_vals, sdf, beta, dists, d_star),
        )
        return (z_vals, sdf, beta), None

    if T > 1:
        (z_vals, sdf, beta), _ = jax.lax.scan(
            upsample_round, (z_buf, sdf_buf, beta_init), None, length=T - 1
        )
    else:
        z_vals, sdf, beta = z_buf, sdf_buf, beta_init

    # final draw from compositing-weight PDF (ray_sampler.py:222-253)
    beta, dists, _ = refine_beta(z_vals, sdf, beta)
    weights, _ = weights_of(z_vals, sdf, beta, dists)
    pdf = weights[:, :-1] + 1e-5
    pdf = pdf / pdf.sum(axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, axis=-1)], axis=-1
    )
    if training:
        u = jax.random.uniform(k_u, (R, cfg.N_samples))
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, cfg.N_samples)[None, :], (R, cfg.N_samples)
        )
    final_samples = _sample_pdf(z_vals, cdf, u)

    # extra samples: near, far, and a random subset of the refined buffer
    # (ray_sampler.py:267-276)
    near_col = jnp.full((R, 1), cfg.near)
    far_col = jnp.full((R, 1), cfg.far)
    if cfg.N_samples_extra > 0:
        if training:
            perm = jax.random.permutation(k_extra, z_vals.shape[1])
            sampling_idx = perm[: cfg.N_samples_extra]
        else:
            sampling_idx = jnp.linspace(
                0, z_vals.shape[1] - 1, cfg.N_samples_extra
            ).astype(jnp.int32)
        z_extra = jnp.concatenate(
            [near_col, far_col, z_vals[:, sampling_idx]], axis=-1
        )
    else:
        z_extra = jnp.concatenate([near_col, far_col], axis=-1)

    z_final = jnp.sort(jnp.concatenate([final_samples, z_extra], axis=-1), axis=-1)

    # random near-surface z for eikonal sampling (ray_sampler.py:279-280)
    eik_idx = jax.random.randint(k_eik, (R, 1), 0, z_final.shape[-1])
    z_eik = jnp.take_along_axis(z_final, eik_idx, axis=-1)
    if return_aux:
        return z_final, z_eik, (z_vals, sdf, beta)
    return z_final, z_eik


def estimate_weights_from_buffer(
    z_query: jnp.ndarray,
    z_buf: jnp.ndarray,
    sdf_buf: jnp.ndarray,
    beta: jnp.ndarray,
):
    """Estimate compositing weights at z_query from the sampler's refined
    probe buffer — zero extra SDF evaluations.

    z_query [R,S] sorted, z_buf [R,W] sorted, sdf_buf [R,W], beta [R].
    Linearly interpolates the probe SDF at z_query, converts to Laplace
    density at the sampler's per-ray beta, and integrates transmittance on
    the query set. Good only for RANKING samples (top-M pruning); the exact
    render recomputes everything on the kept subset.
    """
    inds = _searchsorted_batched(z_buf, z_query)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, z_buf.shape[-1] - 1)
    z_lo = jnp.take_along_axis(z_buf, below, axis=-1)
    z_hi = jnp.take_along_axis(z_buf, above, axis=-1)
    s_lo = jnp.take_along_axis(sdf_buf, below, axis=-1)
    s_hi = jnp.take_along_axis(sdf_buf, above, axis=-1)
    t = (z_query - z_lo) / jnp.where(z_hi - z_lo < 1e-9, 1.0, z_hi - z_lo)
    sdf_est = s_lo + jnp.clip(t, 0.0, 1.0) * (s_hi - s_lo)

    density = laplace_density(sdf_est, beta[:, None])
    dists = z_query[:, 1:] - z_query[:, :-1]
    free_energy = jnp.concatenate(
        [dists * density[:, :-1], jnp.full_like(dists[:, :1], 1e10)], axis=-1
    )
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def ray_marching_surface(
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sdf_fn,
    cfg: SamplerConfig,
    n_steps: int = 128,
    n_secant_steps: int = 8,
    near: jnp.ndarray | None = None,
    far: jnp.ndarray | None = None,
):
    """Sphere-trace-style surface depth via sign-change detection + secant
    refinement (reference ray_marching_surface + secant,
    ray_sampler.py:474-608; used for per-object depth maps in Stage 2).

    Returns (depth [R,1], hit_mask [R]). Rays without a +- sign change get
    depth = far.
    """
    del key
    R = rays_o.shape[0]
    if near is None or far is None:
        _, far_cube = near_far_from_cube(
            rays_o, rays_d, bound=cfg.scene_bounding_sphere,
            min_near=cfg.near, max_far=cfg.far,
        )
        near = jnp.full((R, 1), cfg.near)
        far = far_cube

    t_vals = jnp.linspace(0.0, 1.0, n_steps)[None, :]
    z = near * (1.0 - t_vals) + far * t_vals  # [R, S]
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    val = sdf_fn(pts.reshape(-1, 3)).reshape(R, n_steps)

    # first +- transition (outside -> inside), reference :560-575
    sign_change = (val[:, :-1] > 0) & (val[:, 1:] < 0)
    any_hit = jnp.any(sign_change, axis=-1) & (val[:, 0] > 0)
    first = jnp.argmax(sign_change, axis=-1)  # index of low side

    d_low = jnp.take_along_axis(z, first[:, None], axis=-1)[:, 0]
    f_low = jnp.take_along_axis(val, first[:, None], axis=-1)[:, 0]
    hi = jnp.minimum(first + 1, n_steps - 1)
    d_high = jnp.take_along_axis(z, hi[:, None], axis=-1)[:, 0]
    f_high = jnp.take_along_axis(val, hi[:, None], axis=-1)[:, 0]

    def secant_step(_, carry):
        d_low, f_low, d_high, f_high = carry
        d_pred = -f_low * (d_high - d_low) / (f_high - f_low + 1e-12) + d_low
        p_mid = rays_o + d_pred[:, None] * rays_d
        f_mid = sdf_fn(p_mid)
        same_side = f_mid * f_low > 0
        d_low = jnp.where(same_side, d_pred, d_low)
        f_low = jnp.where(same_side, f_mid, f_low)
        d_high = jnp.where(same_side, d_high, d_pred)
        f_high = jnp.where(same_side, f_high, f_mid)
        return d_low, f_low, d_high, f_high

    d_low, f_low, d_high, f_high = jax.lax.fori_loop(
        0, n_secant_steps, secant_step, (d_low, f_low, d_high, f_high)
    )
    d_pred = -f_low * (d_high - d_low) / (f_high - f_low + 1e-12) + d_low
    depth = jnp.where(any_hit, d_pred, far[:, 0])
    return depth[:, None], any_hit


def uniform_sample(
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    n_samples: int,
    near: jnp.ndarray,
    far: jnp.ndarray,
    training: bool = True,
):
    """Plain stratified uniform sampling (UniformSampler, ray_sampler.py:63-83)."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples)[None, :]
    z_vals = near * (1.0 - t_vals) + far * t_vals
    if training:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals
