"""HoloScene renderer: object-compositional neural-SDF volume rendering.

Assembles the implicit network, rendering network, Laplace density, and
error-bound sampler into the Stage-1/2 forward pass.

Reference semantics: model/network.py:748-971 (`HoloSceneNetwork.forward`),
:1803-1824 (volume_rendering / occlusion_opacity). Differences (documented,
intentional, TPU-first):

  * The forward is a pure function of (params, rng, ray batch) — cameras are
    pre-resolved to rays by the caller so the same code path serves
    perspective (Stage 1) and orthographic (Stage 2) rendering.
  * Eikonal/smoothness gradients for all K objects come from 3 forward-mode
    JVP passes (jacfwd over the 3-D input) instead of K+1 reverse passes
    (model/network.py:226-233).
  * The eikonal/neighbour split is done per-point (the reference's
    half-split at network.py:865-866 mixes objects and points; we pair each
    point with its own neighbour for every object, the intended unisurf
    smoothness).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from holoscene_tpu.models.fields import (
    ImplicitNetworkConfig,
    RenderingNetworkConfig,
    implicit_forward,
    implicit_get_outputs,
    implicit_get_outputs_fused,
    implicit_get_outputs_jvp,
    implicit_all_gradients,
    init_implicit_network,
    init_rendering_network,
    rendering_forward,
)
from holoscene_tpu.ops.density import laplace_beta, laplace_density
from holoscene_tpu.ops.occupancy import (
    OccGridConfig,
    ray_range,
    update_occ_grid,
)
from holoscene_tpu.ops.sampler import (
    SamplerConfig,
    error_bound_sample,
    estimate_weights_from_buffer,
)
from holoscene_tpu.ops.volrend import (
    composite,
    composite_depth,
    occlusion_opacity,
    volume_render_weights,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HoloSceneConfig:
    implicit: ImplicitNetworkConfig
    rendering: RenderingNetworkConfig
    sampler: SamplerConfig
    scene_bounding_sphere: float = 1.0
    white_bkgd: bool = False
    bg_color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    use_bg_reg: bool = True
    render_bg_iter: int = 10
    beta_init: float = 0.1
    beta_min: float = 1e-4
    # Coarse-level SDF probes for SAMPLE PLACEMENT only (the final render
    # always evaluates all levels). None = exact reference semantics; 8
    # halves the sampler's gather traffic, the dominant Stage-1 cost on TPU.
    sampler_grid_levels: int | None = None
    # scene-SDF gradient mode in the main forward: "vjp" (inner reverse pass,
    # reference-equivalent) or "jvp" (3 forward-mode passes whose gathers CSE
    # with the primal — often cheaper under the outer training backward)
    forward_grad_mode: str = "vjp"
    # Top-M render-sample pruning (training only). 0 = exact reference
    # semantics (all n_final samples through the full network). M > 0 keeps
    # the M samples with the highest sampler-estimated compositing weight
    # (plus both endpoints) and runs the expensive second-order network pass
    # on those only. The kept subset spans [near, far], so transmittance
    # still integrates the full ray — this is a coarser quadrature of the
    # same integral, not dropped opacity mass; the samples dropped are the
    # ones the error-bound sampler already resolved as ~zero-weight.
    render_top_m: int = 0
    # Tiered fine levels (training only, fused mode, requires render_top_m):
    # of the kept top-M render samples, only the F highest-weight ones get
    # all hash levels; the tail M-F are encoded with the render_fine_levels
    # coarse levels (fine features zero-padded — the sampler's own
    # approximation applied to low-weight render points). They keep their
    # place in the quadrature, so transmittance is unchanged; only their
    # feature detail coarsens. Cuts render gather rows by
    # (M-F)*(1 - fine_levels/L)/M; measured error on a trained checkpoint
    # is far below dropping the same points (PERF.md offline probes).
    render_fine_top_f: int = 0
    render_fine_levels: int = 8
    # Persistent occupancy grid (ops/occupancy.py): per-ray sampling-interval
    # restriction from cached min-|SDF| evidence, updated free from the
    # sampler's own probe buffer. The sample BUDGET is unchanged (static
    # shapes); the same samples land on the occupied span, so upsample
    # rounds converge sooner (their lax.cond skip fires) and quadrature
    # sharpens. No reference analog — the reference re-probes the full
    # interval every step (ray_sampler.py:130-287).
    use_occupancy: bool = False
    occupancy: OccGridConfig = OccGridConfig()
    # Baked dense probe grid (ops/probe_grid.py): sampler probe SDF queries
    # ride one block-row gather per point instead of levels x 8 hashed rows
    # + the MLP; trainers re-bake every probe_update_every steps (placement
    # reads a slightly stale proxy; render/gradients stay exact). 0 = off.
    probe_grid_res: int = 0
    probe_update_every: int = 16

    def __post_init__(self):
        # the pruned kept-set must be able to span [near, far]: both
        # endpoints are force-kept, so M < 2 would silently break the
        # documented invariant (ADVICE r1)
        if not (self.render_top_m == 0 or self.render_top_m >= 2):
            raise ValueError(
                f"render_top_m must be 0 (off) or >= 2, got {self.render_top_m}"
            )
        if self.render_fine_top_f:
            if self.render_top_m == 0:
                raise ValueError("render_fine_top_f requires render_top_m")
            if not (2 <= self.render_fine_top_f < self.render_top_m):
                raise ValueError(
                    f"render_fine_top_f must be in [2, render_top_m), got "
                    f"{self.render_fine_top_f} vs {self.render_top_m}"
                )
            if not (1 <= self.render_fine_levels < self.implicit.num_levels):
                raise ValueError(
                    "render_fine_levels must be in [1, num_levels)"
                )
            if self.forward_grad_mode != "fused":
                raise ValueError(
                    "render_fine_top_f requires forward_grad_mode='fused'"
                )
            # the tier branch only runs when the fused encode is eligible
            # (render_rays fused_ok) — reject configs where it would be
            # silently inert rather than train untiered without warning
            ic = self.implicit
            if not (ic.color_grid_feature and ic.level_dim == 2
                    and ic.use_grid_feature
                    and ic.grid_interp == "trilinear"):
                raise ValueError(
                    "render_fine_top_f requires the fused-encode-eligible "
                    "implicit config (color_grid_feature, level_dim=2, "
                    "use_grid_feature, trilinear interp)"
                )

    @property
    def num_semantic(self) -> int:
        return self.implicit.d_out

    @classmethod
    def from_conf(cls, conf) -> "HoloSceneConfig":
        """Build from the `model` section of a reference .conf file."""
        fvs = conf.get_int("feature_vector_size", 256)
        sbs = conf.get_float("scene_bounding_sphere", 1.0)
        return cls(
            implicit=ImplicitNetworkConfig.from_conf(
                conf.get_config("implicit_network"), fvs
            ),
            rendering=RenderingNetworkConfig.from_conf(
                conf.get_config("rendering_network"), fvs
            ),
            sampler=SamplerConfig.from_conf(conf.get_config("ray_sampler"), sbs),
            scene_bounding_sphere=sbs,
            white_bkgd=conf.get_bool("white_bkgd", False),
            bg_color=tuple(conf.get_list("bg_color", [1.0, 1.0, 1.0])),
            use_bg_reg=conf.get_bool("use_bg_reg", False),
            render_bg_iter=conf.get_int("render_bg_iter", 10),
            beta_init=conf.get_float("density.params_init.beta", 0.1),
            beta_min=conf.get_float("density.beta_min", 1e-4),
            # TPU fast-path knobs (each quality-validated; see PERF.md):
            # sampler_grid_levels=8 halves sampler gather traffic,
            # render_top_m prunes the second-order render pass,
            # forward_grad_mode picks the scene-SDF gradient construction
            sampler_grid_levels=(
                conf.get_int("sampler_grid_levels")
                if "sampler_grid_levels" in conf else None
            ),
            render_top_m=conf.get_int("render_top_m", 0),
            render_fine_top_f=conf.get_int("render_fine_top_f", 0),
            render_fine_levels=conf.get_int("render_fine_levels", 8),
            forward_grad_mode=conf.get_string("forward_grad_mode", "vjp"),
            use_occupancy=conf.get_bool("use_occupancy", False),
            probe_grid_res=conf.get_int("probe_grid_res", 0),
            probe_update_every=conf.get_int("probe_update_every", 16),
            occupancy=OccGridConfig(
                resolution=conf.get_int("occupancy_resolution", 64),
                bound=sbs,
                taps=conf.get_int("occupancy_taps", 64),
            ),
        )


def init_holoscene(key: jax.Array, cfg: HoloSceneConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "implicit": init_implicit_network(k1, cfg.implicit),
        "rendering": init_rendering_network(k2, cfg.rendering),
        "density": {"beta": jnp.asarray(cfg.beta_init, dtype=jnp.float32)},
    }


def get_beta(params: Params, cfg: HoloSceneConfig) -> jnp.ndarray:
    return laplace_beta(params["density"]["beta"], cfg.beta_min)


def scene_sdf_nograd(params: Params, cfg: HoloSceneConfig, obj_idxs=None):
    """Stop-gradient scene-SDF closure for the sampler (the reference samples
    under torch.no_grad, ray_sampler.py:150-156). obj_idxs selects a subset
    min-SDF for object-centric Stage-2 rendering."""
    from holoscene_tpu.models.fields import implicit_sdf_raw_sampler
    from holoscene_tpu.ops.hashgrid import build_dense_block_tables

    frozen = jax.lax.stop_gradient(params["implicit"])
    # dense-level block tables: built once per traced step, hoisted out of
    # the sampler's scan by XLA (loop-invariant). Capped at the probe level
    # count so a large dense_max_res doesn't build unused fine-level blocks.
    blocks = build_dense_block_tables(frozen["grid"], cfg.implicit.grid_meta,
                                      max_levels=cfg.sampler_grid_levels)

    def fn(pts: jnp.ndarray) -> jnp.ndarray:
        raw = implicit_sdf_raw_sampler(
            frozen, cfg.implicit, pts, blocks,
            grid_levels=cfg.sampler_grid_levels,
        )
        if obj_idxs is not None:
            raw = raw[:, list(obj_idxs)]
        return raw.min(axis=-1)

    return fn


def make_probe_bake(cfg: HoloSceneConfig):
    """Jitted bake of the sampler probe grid from the CURRENT params
    (ops/probe_grid.bake_probe_grid over the same coarse-level SDF the
    sampler would query). Trainers call this every cfg.probe_update_every
    steps and pass the result as render_rays(probe=...)."""
    assert cfg.probe_grid_res > 0, "probe_grid_res must be set"

    from holoscene_tpu.ops.probe_grid import bake_probe_grid

    @jax.jit
    def bake(params):
        return bake_probe_grid(
            scene_sdf_nograd(params, cfg), cfg.probe_grid_res,
            cfg.sampler.scene_bounding_sphere)

    return bake


def render_rays(
    params: Params,
    cfg: HoloSceneConfig,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth_scale: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    training: bool = True,
    compute_eikonal: bool = True,
    occ: jnp.ndarray | None = None,
    update_occ: bool = False,
    probe: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Render a batch of rays (model/network.py:778-913).

    rays_o [R,3], rays_d [R,3] unit; depth_scale [R,1] (camera-z of the unit
    ray, converts distance to z-depth); w2c_rot [3,3] rotates world normals
    into the camera frame.

    occ: optional occupancy grid (ops/occupancy.init_occ_grid) — restricts
    each ray's sampling interval to its occupied span; with update_occ the
    sampler's probe buffer is folded back in and the refreshed grid is
    returned as out["occ"] (unchanged grid otherwise).

    probe: optional baked probe-grid block table (ops/probe_grid.py,
    [probe_grid_res^3, 8]) — the sampler's placement SDF queries read this
    proxy instead of the hashed field (trainers re-bake it on a cadence;
    make_probe_bake). Rendering and all gradients stay exact.
    """
    R = rays_o.shape[0]
    k_sampler, k_eik, k_nei = jax.random.split(key, 3)

    beta_sg = jax.lax.stop_gradient(get_beta(params, cfg))
    near = far = None
    if occ is not None and not update_occ:
        # grid-update steps (1 in occ_update_every) deliberately sample the
        # FULL interval: restricted-only training starves excluded regions
        # of color/density supervision and they drift to fog the eval
        # sampler then integrates (the r4 512² flagship collapse, PERF.md);
        # the duty-cycled full pass keeps every region supervised AND gives
        # the grid unrestricted probe coverage
        from holoscene_tpu.ops.rays import near_far_from_cube

        _, far0 = near_far_from_cube(
            rays_o, rays_d, bound=cfg.sampler.scene_bounding_sphere,
            min_near=cfg.sampler.near, max_far=cfg.sampler.far,
        )
        near0 = jnp.full((R, 1), cfg.sampler.near)
        near, far = ray_range(
            occ, rays_o, rays_d, near0, far0, beta_sg, cfg.occupancy)

    if probe is not None:
        from holoscene_tpu.ops.probe_grid import probe_sdf_fn

        sampler_sdf = probe_sdf_fn(
            jax.lax.stop_gradient(probe), cfg.probe_grid_res,
            cfg.sampler.scene_bounding_sphere)
    else:
        sampler_sdf = scene_sdf_nograd(params, cfg)

    prune_m = cfg.render_top_m if training else 0
    tier_ord = None
    need_aux = prune_m > 0 or (occ is not None and update_occ)
    if need_aux:
        z_vals, z_eik, (z_buf, sdf_buf, beta_buf) = error_bound_sample(
            k_sampler, rays_o, rays_d, sampler_sdf,
            beta_sg, cfg.sampler,
            training=training, return_aux=True, near=near, far=far,
        )
        if 0 < prune_m < z_vals.shape[-1]:
            est_w = estimate_weights_from_buffer(z_vals, z_buf, sdf_buf,
                                                 beta_buf)
            # force-keep both endpoints so the kept set spans [near, far]
            score = est_w.at[:, 0].set(jnp.inf).at[:, -1].set(jnp.inf)
            _, keep = jax.lax.top_k(score, prune_m)
            keep = jnp.sort(keep, axis=-1)
            z_vals = jnp.take_along_axis(z_vals, keep, axis=-1)
            if cfg.render_fine_top_f:
                # per-ray sample order by descending estimated weight: the
                # first F positions form the fine tier (endpoints score inf
                # -> always fine). Stable over kept order via argsort.
                kept_w = jnp.take_along_axis(score, keep, axis=-1)
                tier_ord = jnp.argsort(-kept_w, axis=-1)  # [R, M]
    else:
        z_vals, z_eik = error_bound_sample(
            k_sampler, rays_o, rays_d, sampler_sdf,
            beta_sg, cfg.sampler,
            training=training, near=near, far=far,
        )
    S = z_vals.shape[-1]

    points = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(rays_d[:, None, :], points.shape).reshape(-1, 3)

    ic = cfg.implicit
    fused_ok = (
        ic.color_grid_feature and ic.level_dim == 2 and ic.use_grid_feature
        and ic.grid_interp == "trilinear"
    )
    if cfg.forward_grad_mode == "fused" and fused_ok:
        if training and ic.color_bwd_sample:
            # per-step entropy for the stochastic color-grid backward
            # (fields.py color_bwd_sample): uint32 bits carried in an f32
            # scalar so it rides the custom_vjp's differentiable-arg slot.
            gs = jax.lax.bitcast_convert_type(
                jax.random.bits(jax.random.fold_in(key, 7), dtype=jnp.uint32),
                jnp.float32,
            )
            get_outputs = functools.partial(
                implicit_get_outputs_fused, grad_seed=gs
            )
        else:
            get_outputs = implicit_get_outputs_fused
    elif cfg.forward_grad_mode == "jvp":
        get_outputs = implicit_get_outputs_jvp
    else:
        get_outputs = implicit_get_outputs
    fused_path = cfg.forward_grad_mode == "fused" and fused_ok
    if tier_ord is not None and fused_path:
        # tiered fine levels: encode the F highest-weight samples per ray
        # with all levels, the tail with the coarse prefix only (fine
        # features zero-padded inside implicit_get_outputs_fused), then
        # restore the depth order. Transmittance/quadrature are unchanged —
        # only the tail's feature detail coarsens (see HoloSceneConfig).
        F = cfg.render_fine_top_f
        inv_ord = jnp.argsort(tier_ord, axis=-1)
        pts_perm = jnp.take_along_axis(points, tier_ord[..., None], axis=1)
        o_fine = get_outputs(
            params["implicit"], cfg.implicit, pts_perm[:, :F].reshape(-1, 3)
        )
        o_tail = get_outputs(
            params["implicit"], cfg.implicit, pts_perm[:, F:].reshape(-1, 3),
            coarse_levels=cfg.render_fine_levels,
        )

        def reassemble(a, b):
            m = jnp.concatenate(
                [a.reshape((R, F) + a.shape[1:]),
                 b.reshape((R, S - F) + b.shape[1:])], axis=1,
            )
            idx = inv_ord.reshape((R, S) + (1,) * (m.ndim - 2))
            return jnp.take_along_axis(m, idx, axis=1).reshape(
                (R * S,) + a.shape[1:]
            )

        sdf, feature_vectors, gradients, semantic, sdf_raw = (
            reassemble(a, b) for a, b in zip(o_fine, o_tail)
        )
    else:
        sdf, feature_vectors, gradients, semantic, sdf_raw = get_outputs(
            params["implicit"], cfg.implicit, points_flat
        )
    rgb_flat = rendering_forward(
        params["rendering"], cfg.rendering, points_flat, gradients, dirs_flat,
        feature_vectors,
    )

    beta = get_beta(params, cfg)
    density = laplace_density(sdf.reshape(R, S), beta)
    weights, transmittance, dists = volume_render_weights(z_vals, density)

    obj_density = laplace_density(sdf_raw.reshape(R, S, -1), beta)
    object_opacity = occlusion_opacity(transmittance, dists, obj_density)

    rgb = rgb_flat.reshape(R, S, 3)
    semantic_r = semantic.reshape(R, S, cfg.num_semantic)
    rgb_values = composite(weights, rgb)
    semantic_values = composite(weights, semantic_r)
    depth_values = depth_scale * composite_depth(weights, z_vals)

    if cfg.white_bkgd:
        acc = weights.sum(axis=-1, keepdims=True)
        rgb_values = rgb_values + (1.0 - acc) * jnp.asarray(cfg.bg_color)

    normals = gradients / jnp.sqrt(
        jnp.sum(gradients * gradients, axis=-1, keepdims=True) + 1e-12
    )
    normal_map = composite(weights, normals.reshape(R, S, 3))
    normal_map = normal_map @ w2c_rot.T

    out = {
        "rgb_values": rgb_values,
        "semantic_values": semantic_values,
        "object_opacity": object_opacity,
        "depth_values": depth_values,
        "normal_map": normal_map,
        "z_vals": z_vals,
        "sdf": sdf.reshape(R, S),
        "weights": weights,
    }

    if occ is not None:
        if update_occ:
            probe_pts = (rays_o[:, None, :]
                         + z_buf[..., None] * rays_d[:, None, :])
            out["occ"] = update_occ_grid(occ, probe_pts, sdf_buf,
                                         cfg.occupancy)
        else:
            out["occ"] = occ

    if training and compute_eikonal:
        # eikonal + smoothness samples (network.py:843-866)
        eik_uniform = jax.random.uniform(
            k_eik, (R, 3),
            minval=-cfg.scene_bounding_sphere, maxval=cfg.scene_bounding_sphere,
        )
        eik_near = rays_o + z_eik * rays_d
        eik_pts = jnp.concatenate([eik_uniform, eik_near], axis=0)
        nei_pts = eik_pts + (jax.random.uniform(k_nei, eik_pts.shape) - 0.5) * 0.01

        # one batched jacobian call for eik + neighbour points: same math,
        # but the encode/gather/scatter work merges into single passes
        both = jnp.concatenate([eik_pts, nei_pts], axis=0)
        grads_both = implicit_all_gradients(params["implicit"], cfg.implicit,
                                            both)
        M = eik_pts.shape[0]
        out["grad_theta"] = grads_both[:M]        # [M, K+1, 3]
        out["grad_theta_nei"] = grads_both[M:]

        # SDF only — the reference uses get_sdf_raw here (network.py:83),
        # which skips the color grid
        sample_raw, _ = implicit_forward(
            params["implicit"], cfg.implicit, eik_pts, with_features=False
        )
        out["sample_sdf"] = sample_raw                     # [M, K]
        out["sample_minsdf"] = sample_raw.min(axis=-1)     # [M]

    return out


def render_rays_multi_obj(
    params: Params,
    cfg: HoloSceneConfig,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth_scale: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    obj_idxs: tuple[int, ...],
    training: bool = False,
    near: jnp.ndarray | None = None,
    far: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Object-subset rendering for Stage 2 (orthographic object views).

    Reference semantics: forward_multi_obj_rays / _subset_all_sdf
    (model/network.py:1092-1235): sampling and semantic weights use the
    SUBSET min-SDF, while RGB/depth/normal composite under the FULL scene
    min-SDF weights (`bg_weights`) so occlusions by other objects stay
    consistent; object_opacity comes from all per-object densities.
    """
    R = rays_o.shape[0]
    z_vals, _ = error_bound_sample(
        key, rays_o, rays_d, scene_sdf_nograd(params, cfg, obj_idxs=obj_idxs),
        jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
        training=training, near=near, far=far,
    )
    S = z_vals.shape[-1]
    points = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(rays_d[:, None, :], points.shape).reshape(-1, 3)

    sdf_scene, feature_vectors, gradients, semantic, sdf_raw = (
        implicit_get_outputs(params["implicit"], cfg.implicit, points_flat)
    )
    rgb_flat = rendering_forward(
        params["rendering"], cfg.rendering, points_flat, gradients, dirs_flat,
        feature_vectors,
    )

    beta = get_beta(params, cfg)
    subset_sdf = sdf_raw[:, list(obj_idxs)].min(axis=-1).reshape(R, S)
    weights, transmittance, dists = volume_render_weights(
        z_vals, laplace_density(subset_sdf, beta)
    )
    bg_weights, _, _ = volume_render_weights(
        z_vals, laplace_density(sdf_scene.reshape(R, S), beta)
    )

    obj_density = laplace_density(sdf_raw.reshape(R, S, -1), beta)
    object_opacity = occlusion_opacity(transmittance, dists, obj_density)

    rgb = rgb_flat.reshape(R, S, 3)
    rgb_values = composite(bg_weights, rgb)
    semantic_r = semantic.reshape(R, S, cfg.num_semantic)
    semantic_values = composite(weights, semantic_r)
    depth_values = depth_scale * composite_depth(bg_weights, z_vals)

    normals = gradients / jnp.sqrt(
        jnp.sum(gradients * gradients, axis=-1, keepdims=True) + 1e-12
    )
    normal_map = composite(bg_weights, normals.reshape(R, S, 3)) @ w2c_rot.T

    return {
        "rgb_values": rgb_values,
        "semantic_values": semantic_values,
        "object_opacity": object_opacity,
        "depth_values": depth_values,
        "normal_map": normal_map,
        "weights": weights,
        "bg_weights": bg_weights,
        "subset_weight_sum": weights.sum(axis=-1),
        "z_vals": z_vals,
        "sdf": subset_sdf,
    }


def render_rays_only_multi_obj(
    params: Params,
    cfg: HoloSceneConfig,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth_scale: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    obj_idxs: tuple[int, ...],
    training: bool = False,
    near: jnp.ndarray | None = None,
    far: jnp.ndarray | None = None,
    detach_rgb_geometry: bool = False,
) -> dict[str, jnp.ndarray]:
    """Render ONLY the selected objects, as if nothing else existed
    (reference forward_only_multi_obj_rays :1166 and the
    _detach_rgb_for_geometry variants :1384-1458, used for the Stage-2
    invisible-view supervision where generated views see the object in
    isolation).

    detach_rgb_geometry stops RGB-loss gradients from reshaping geometry
    (weights are stop-gradient'ed for the color composite).
    """
    R = rays_o.shape[0]
    z_vals, _ = error_bound_sample(
        key, rays_o, rays_d, scene_sdf_nograd(params, cfg, obj_idxs=obj_idxs),
        jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
        training=training, near=near, far=far,
    )
    S = z_vals.shape[-1]
    points = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(rays_d[:, None, :], points.shape).reshape(-1, 3)

    _, feature_vectors, gradients, _, sdf_raw = implicit_get_outputs(
        params["implicit"], cfg.implicit, points_flat
    )
    rgb_flat = rendering_forward(
        params["rendering"], cfg.rendering, points_flat, gradients, dirs_flat,
        feature_vectors,
    )

    beta = get_beta(params, cfg)
    subset_sdf = sdf_raw[:, list(obj_idxs)].min(axis=-1).reshape(R, S)
    weights, _, _ = volume_render_weights(
        z_vals, laplace_density(subset_sdf, beta)
    )

    w_rgb = jax.lax.stop_gradient(weights) if detach_rgb_geometry else weights
    rgb_values = composite(w_rgb, rgb_flat.reshape(R, S, 3))
    depth_values = depth_scale * composite_depth(weights, z_vals)
    normals = gradients / jnp.sqrt(
        jnp.sum(gradients * gradients, axis=-1, keepdims=True) + 1e-12
    )
    normal_map = composite(weights, normals.reshape(R, S, 3)) @ w2c_rot.T
    acc = weights.sum(axis=-1)

    return {
        "rgb_values": rgb_values,
        "depth_values": depth_values,
        "normal_map": normal_map,
        "acc": acc,
        "weights": weights,
        "z_vals": z_vals,
        "sdf": subset_sdf,
    }


def query_point_colors(
    params: Params,
    cfg: HoloSceneConfig,
    points: jnp.ndarray,
    view_dirs: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Colors + unit normals of the field at given surface points/views
    (reference get_colors_normals_from_point_rays*, model/network.py:
    1532-1802 — used to color Stage-2/3 meshes from the trained field).
    Returns (rgb [N,3], normals [N,3])."""
    _, feature_vectors, gradients, _, _ = implicit_get_outputs(
        params["implicit"], cfg.implicit, points
    )
    rgb = rendering_forward(
        params["rendering"], cfg.rendering, points, gradients, view_dirs,
        feature_vectors,
    )
    normals = gradients / jnp.sqrt(
        jnp.sum(gradients * gradients, axis=-1, keepdims=True) + 1e-12
    )
    return rgb, normals


def render_bg_patch(
    params: Params,
    cfg: HoloSceneConfig,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth_scale: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    training: bool = True,
) -> dict[str, jnp.ndarray]:
    """Background(object-0)-only patch render for the smoothness regularizer
    (model/network.py:916-968). Returns bg depth/normal and an occlusion mask
    derived from the scene semantics."""
    R = rays_o.shape[0]
    z_vals, _ = error_bound_sample(
        key, rays_o, rays_d, scene_sdf_nograd(params, cfg, obj_idxs=(0,)),
        jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
        training=training,
    )
    S = z_vals.shape[-1]
    points_flat = (
        rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    ).reshape(-1, 3)

    sdf_all, _, gradients, semantic, sdf_raw = implicit_get_outputs(
        params["implicit"], cfg.implicit, points_flat
    )
    beta = get_beta(params, cfg)

    bg_sdf = sdf_raw[:, 0].reshape(R, S)
    bg_weights, _, _ = volume_render_weights(z_vals, laplace_density(bg_sdf, beta))
    scene_weights, _, _ = volume_render_weights(
        z_vals, laplace_density(sdf_all.reshape(R, S), beta)
    )

    semantic_r = semantic.reshape(R, S, cfg.num_semantic)
    bg_semantic = composite(scene_weights, semantic_r)
    bg_mask = jnp.argmax(bg_semantic, axis=-1, keepdims=True)

    bg_depth = depth_scale * composite_depth(bg_weights, z_vals)

    normals = gradients / jnp.sqrt(
        jnp.sum(gradients * gradients, axis=-1, keepdims=True) + 1e-12
    )
    bg_normal = composite(bg_weights, normals.reshape(R, S, 3)) @ w2c_rot.T

    return {
        "bg_depth_values": bg_depth,
        "bg_normal_map": bg_normal,
        "bg_mask": bg_mask,
    }
