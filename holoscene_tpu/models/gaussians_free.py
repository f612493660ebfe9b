"""Free (unconstrained) 3D Gaussian splatting model + densification.

Reference counterparts:
  * `GS` container (model/gs.py:648-841): plain 3DGS params reloaded from
    exported gaussians for eval/USD export;
  * `GoMAdaptive` / nerfstudio-splatfacto densification
    (model/gom_adaptive.py:1126-1406: grad-norm accumulation, cull / split /
    dup with optimizer-state surgery);
  * 3dgrut's `MixtureOfGaussians` + MCMC relocation strategy
    (threedgrut/model/model.py:45, threedgrut/strategy/src/gaussian_mcmc.cu);
  * SelectiveAdam — visibility-masked fused Adam
    (threedgrut/optimizers/optimizers.cu:28).

TPU-native redesign: gaussian counts NEVER change shape. The model owns a
fixed capacity of slots with an `alive` mask; culling clears slots,
densification writes split/dup children into dead slots, and MCMC-style
relocation recycles dead slots at high-opacity sites. All strategy steps are
jit-compiled tensor ops — no host-side tensor surgery, no recompilation as
the population evolves (the CUDA implementations re-allocate instead).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.gaussians import num_sh_bases, rgb_to_sh
from holoscene_tpu.ops.splat import render_gaussians


@dataclasses.dataclass(frozen=True)
class FreeGaussianConfig:
    capacity: int = 100000
    sh_degree: int = 3
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    tile_size: int = 16
    max_per_tile: int = 512
    use_pallas: bool | None = None  # fused Pallas kernels; None = auto (TPU)
    # camera model for training/eval renders: pinhole | opencv | fisheye
    # (+ dist coeffs) — non-pinhole routes through the UT projection
    camera_model: str = "pinhole"
    dist: tuple | None = None
    # flat sorted-candidate pipeline with per-frame amortized binning
    # (ops/splat_flat.py; exact compositing, no K). None = auto: on for TPU
    # training steps. Caches are invalidated on refine/relocate events.
    use_flat: bool | None = None
    rebin_every: int = 8


def init_free_gaussians(
    key: jax.Array,
    cfg: FreeGaussianConfig,
    points: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    init_scale: float | None = None,
    scene_extent: float = 1.0,
) -> dict:
    """Seed from points (SfM/mesh samples) or randomly (reference
    random_init, gs.py/model.py)."""
    n_cap = cfg.capacity
    k1, k2, k3 = jax.random.split(key, 3)
    if points is None:
        n_seed = min(n_cap, 50000)
        points = np.asarray(
            jax.random.uniform(k1, (n_seed, 3), minval=-scene_extent,
                               maxval=scene_extent)
        )
    points = np.asarray(points)[:n_cap]
    n_seed = len(points)

    if colors is None:
        colors = np.full((n_seed, 3), 0.5)

    if init_scale is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(points)
        d, _ = tree.query(points, k=min(4, n_seed))
        avg = d[:, 1:].mean(axis=1) if d.ndim > 1 and d.shape[1] > 1 else np.full(n_seed, 0.02)
        scales = np.log(np.maximum(avg, 1e-4))[:, None].repeat(3, axis=1)
    else:
        scales = np.full((n_seed, 3), np.log(init_scale))

    dim_sh = num_sh_bases(cfg.sh_degree)

    def pad(x, fill=0.0):
        out = np.full((n_cap,) + x.shape[1:], fill, dtype=np.float32)
        out[:n_seed] = x
        return jnp.asarray(out)

    params = {
        "means": pad(points),
        "log_scales": pad(scales, fill=np.log(1e-3)),
        "quats": pad(
            np.tile(np.array([[1.0, 0, 0, 0]], dtype=np.float32), (n_seed, 1))
        ).at[n_seed:, 0].set(1.0),
        "opacity_logits": pad(
            np.full((n_seed,), float(jax.scipy.special.logit(0.1))),
            fill=-12.0,
        ),
        "features_dc": pad(np.asarray(rgb_to_sh(jnp.asarray(colors)))),
        "features_rest": jnp.zeros((n_cap, dim_sh - 1, 3), dtype=jnp.float32),
    }
    state = {
        "alive": jnp.arange(n_cap) < n_seed,
        "grad_accum": jnp.zeros(n_cap),
        "grad_count": jnp.zeros(n_cap),
    }
    return params, state


def free_project(params, state, cfg: FreeGaussianConfig, pose_c2w,
                 intrinsics, width, height):
    """Projected geometry (xy, depth, conic, opac, valid) matching
    render_free_gaussians' projection choice (EWA or UT) — feeds the flat
    pipeline's binning refresh."""
    from holoscene_tpu.ops.gaussians import (
        covariance_3d,
        project_gaussians,
        project_gaussians_ut,
        quat_to_rotmat,
    )

    pose = jnp.asarray(pose_c2w, dtype=jnp.float32)
    rot = pose[:3, :3].T
    viewmat = (
        jnp.eye(4, dtype=jnp.float32)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(-rot @ pose[:3, 3])
    )
    opac = jax.nn.sigmoid(params["opacity_logits"]) * state["alive"]
    intr = jnp.asarray(intrinsics, jnp.float32)
    scales = jnp.exp(params["log_scales"])
    if cfg.camera_model != "pinhole":
        sqrt_cov = quat_to_rotmat(params["quats"]) * scales[..., None, :]
        xy, depth, conic, _r, valid = project_gaussians_ut(
            params["means"], sqrt_cov, viewmat, intr, width, height,
            camera_model=cfg.camera_model, dist=cfg.dist)
    else:
        cov3d = covariance_3d(params["quats"], scales)
        xy, depth, conic, _r, valid = project_gaussians(
            params["means"], cov3d, viewmat, intr, width, height)
    return xy, depth, conic, opac, valid


def free_flat_bins(params, state, cfg: FreeGaussianConfig, pose_c2w,
                   intrinsics, width, height, plan):
    """Amortized-binning refresh for free gaussians (one camera)."""
    from holoscene_tpu.ops.splat_flat import build_flat_bins

    xy, depth, conic, opac, valid = free_project(
        params, state, cfg, pose_c2w, intrinsics, width, height)
    tiles_x = -(-width // cfg.tile_size)
    tiles_y = -(-height // cfg.tile_size)
    return build_flat_bins(
        xy, depth, conic, opac, valid, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_size=cfg.tile_size, plan=plan)


def render_free_gaussians(params, state, cfg: FreeGaussianConfig, pose_c2w,
                          intrinsics, width, height, background=None,
                          flat_plan=None, flat_bins=None):
    pose = jnp.asarray(pose_c2w, dtype=jnp.float32)
    rot = pose[:3, :3].T
    viewmat = (
        jnp.eye(4, dtype=jnp.float32)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(-rot @ pose[:3, 3])
    )
    opac = jax.nn.sigmoid(params["opacity_logits"]) * state["alive"]
    colors = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )
    return render_gaussians(
        params["means"], params["quats"], jnp.exp(params["log_scales"]),
        opac, colors, viewmat, jnp.asarray(intrinsics, jnp.float32),
        width, height, tile_size=cfg.tile_size, max_per_tile=cfg.max_per_tile,
        sh_degree=cfg.sh_degree, background=background,
        use_pallas=cfg.use_pallas,
        # non-pinhole models ride the UT projection (ops/gaussians) — the
        # 3DGUT train-on-distorted-captures capability
        camera_model=cfg.camera_model, dist=cfg.dist,
        flat_plan=flat_plan, flat_bins=flat_bins,
    )


# ---------------------------------------------------------------------------
# densification strategy (fixed-capacity, mask-based)
# ---------------------------------------------------------------------------


@jax.jit
def accumulate_positional_grads(state: dict, mean_grads: jnp.ndarray) -> dict:
    """after_train (gom_adaptive.py:1126): accumulate positional grad norms
    per gaussian between refinement steps."""
    norms = jnp.linalg.norm(mean_grads, axis=-1)
    return {
        **state,
        "grad_accum": state["grad_accum"] + norms,
        "grad_count": state["grad_count"] + (norms > 0),
    }


def refine_gaussians(key, params, state, cfg: FreeGaussianConfig,
                     scene_extent: float = 1.0):
    """Cull + split + dup in dead slots (refinement_after,
    gom_adaptive.py:1154-1406), shapes static. Returns (params, state,
    stats). Caller resets optimizer moments for touched slots via
    `reset_mask` in stats."""
    alive = state["alive"]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    scales = jnp.exp(params["log_scales"])
    max_scale = scales.max(axis=-1)

    # ---- cull (:1263) ----
    cull = alive & (
        (opac < cfg.cull_alpha_thresh)
        | (max_scale > cfg.cull_scale_thresh * scene_extent)
    )
    alive = alive & ~cull

    # ---- densify candidates ----
    avg_grad = state["grad_accum"] / jnp.maximum(state["grad_count"], 1.0)
    hot = alive & (avg_grad > cfg.densify_grad_thresh)
    split = hot & (max_scale > cfg.densify_size_thresh * scene_extent)
    dup = hot & ~split

    n_cap = alive.shape[0]
    # priority for spawning: split first, then dup
    spawn_priority = jnp.where(split, 2.0, jnp.where(dup, 1.0, 0.0))
    order = jnp.argsort(-spawn_priority)  # parents, best first
    dead_order = jnp.argsort(alive)  # dead slots first

    n_spawn = jnp.minimum(
        (spawn_priority > 0).sum(), (~alive).sum()
    )

    slot_idx = jnp.arange(n_cap)
    parent = order  # parent[i] spawns into dead_order[i]
    child = dead_order
    active_spawn = slot_idx < n_spawn
    parent_is_split = split[parent]
    do_spawn = active_spawn & (spawn_priority[parent] > 0)

    k1, k2 = jax.random.split(key)
    # split children sample inside the parent gaussian (:1309); dup copies
    eps = jax.random.normal(k1, (n_cap, 3))
    from holoscene_tpu.ops.gaussians import quat_to_rotmat

    rot = quat_to_rotmat(params["quats"][parent])
    offset = jnp.einsum("nij,nj->ni", rot, eps * jnp.exp(params["log_scales"][parent]))
    child_means = params["means"][parent] + jnp.where(
        parent_is_split[:, None], offset, 0.0
    )
    scale_div = jnp.where(parent_is_split, np.log(1.6), 0.0)
    child_log_scales = params["log_scales"][parent] - scale_div[:, None]

    def spawn_set(arr, child_vals):
        upd = jnp.where(
            do_spawn.reshape((-1,) + (1,) * (arr.ndim - 1)),
            child_vals,
            arr[child],
        )
        return arr.at[child].set(upd)

    new_params = dict(params)
    new_params["means"] = spawn_set(params["means"], child_means)
    new_params["log_scales"] = spawn_set(params["log_scales"], child_log_scales)
    new_params["quats"] = spawn_set(params["quats"], params["quats"][parent])
    new_params["opacity_logits"] = spawn_set(
        params["opacity_logits"], params["opacity_logits"][parent]
    )
    new_params["features_dc"] = spawn_set(
        params["features_dc"], params["features_dc"][parent]
    )
    new_params["features_rest"] = spawn_set(
        params["features_rest"], params["features_rest"][parent]
    )
    # split parents also shrink (:1309 splits into n samples)
    new_params["log_scales"] = jnp.where(
        split[:, None], new_params["log_scales"] - np.log(1.6),
        new_params["log_scales"],
    )

    spawned = jnp.zeros(n_cap, bool).at[child].set(do_spawn)
    alive = alive | spawned

    new_state = {
        "alive": alive,
        "grad_accum": jnp.zeros(n_cap),
        "grad_count": jnp.zeros(n_cap),
    }
    stats = {
        "n_culled": cull.sum(),
        "n_split": (split & alive).sum(),
        "n_spawned": spawned.sum(),
        "reset_mask": spawned | cull,
        "n_alive": alive.sum(),
    }
    return new_params, new_state, stats


def mcmc_relocate(key, params, state, cfg: FreeGaussianConfig,
                  fraction: float = 0.05):
    """MCMC-style relocation (threedgrut/strategy/src/gaussian_mcmc.cu:13):
    move the lowest-opacity fraction of alive gaussians to the sites of
    high-opacity ones, rescaling opacity so total density is preserved
    (binomial recompute with n=2)."""
    alive = state["alive"]
    opac = jax.nn.sigmoid(params["opacity_logits"]) * alive
    n_cap = alive.shape[0]
    n_move = int(n_cap * fraction)

    dead_score = jnp.where(alive, opac, jnp.inf)
    move_idx = jnp.argsort(dead_score)[:n_move]           # weakest alive
    target_p = opac / jnp.maximum(opac.sum(), 1e-9)
    target_idx = jax.random.choice(key, n_cap, (n_move,), p=target_p)

    # binomial opacity split: new_o = 1 - sqrt(1 - o)
    t_opac = jax.nn.sigmoid(params["opacity_logits"][target_idx])
    new_opac = 1.0 - jnp.sqrt(jnp.maximum(1.0 - t_opac, 1e-6))
    new_logit = jax.scipy.special.logit(jnp.clip(new_opac, 1e-5, 1 - 1e-5))

    new_params = dict(params)
    for name in ("means", "quats", "log_scales", "features_dc", "features_rest"):
        new_params[name] = params[name].at[move_idx].set(
            params[name][target_idx]
        )
    new_params["opacity_logits"] = (
        params["opacity_logits"]
        .at[move_idx].set(new_logit)
        .at[target_idx].set(new_logit)
    )
    reset = jnp.zeros(n_cap, bool).at[move_idx].set(True).at[target_idx].set(True)
    return new_params, state, {"reset_mask": reset, "n_moved": n_move}


# ---------------------------------------------------------------------------
# SelectiveAdam
# ---------------------------------------------------------------------------


def selective_adam_update(
    grads: dict,
    moments: dict,
    params: dict,
    visibility: jnp.ndarray,
    lr: dict | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """Visibility-masked Adam (threedgrut/optimizers/optimizers.cu:28):
    moments and params update ONLY for visible gaussians; invisible ones are
    untouched (no moment decay). moments = {'m': tree, 'v': tree, 'count'}.
    """
    count = moments["count"] + 1

    def upd(name, g, m, v, p):
        vis = visibility.reshape((-1,) + (1,) * (g.ndim - 1))
        m_new = jnp.where(vis, b1 * m + (1 - b1) * g, m)
        v_new = jnp.where(vis, b2 * v + (1 - b2) * g * g, v)
        m_hat = m_new / (1 - b1 ** count)
        v_hat = v_new / (1 - b2 ** count)
        this_lr = lr[name] if isinstance(lr, dict) else lr
        p_new = jnp.where(
            vis, p - this_lr * m_hat / (jnp.sqrt(v_hat) + eps), p
        )
        return p_new, m_new, v_new

    new_p, new_m, new_v = {}, {}, {}
    for name in params:
        new_p[name], new_m[name], new_v[name] = upd(
            name, grads[name], moments["m"][name], moments["v"][name],
            params[name],
        )
    return new_p, {"m": new_m, "v": new_v, "count": count}


def init_selective_adam(params: dict) -> dict:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.asarray(0)}


def reset_moments(moments: dict, mask: jnp.ndarray) -> dict:
    """Optimizer-state surgery for refreshed slots (gom_adaptive.py:1061)."""
    def z(x):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return {
        "m": jax.tree_util.tree_map(z, moments["m"]),
        "v": jax.tree_util.tree_map(z, moments["v"]),
        "count": moments["count"],
    }
