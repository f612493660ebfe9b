"""Per-object SDF refinement under generated-view + collision constraints.

Reference semantics: training/holoscene_train_post.py —
  * `foreground_object_reconstruction` (:3394): clone the Stage-1 model,
    ~500 iterations of (Stage-1 losses on class-targeted rays) +
    `calculate_invisible_loss` (:458: orthographic renders of the object in
    isolation vs generated rgb/normal/mask) + grid-sampled parent-SDF
    collision losses (:3620-3700) + eikonal;
  * `background_reconstruction` (:3245): the same for object 0 with
    background smoothness;
  * SDF constraint losses get_pts_sdf_contraints_loss / maintain /
    additional (model/network.py:973-1013).

All refinement steps are jitted; generated views are consumed as fixed-size
pixel batches sampled per iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from holoscene_tpu.losses.holoscene_loss import (
    LossConfig,
    holoscene_loss,
    safe_normalize,
)
from holoscene_tpu.models.fields import (
    implicit_all_gradients,
    implicit_sdf_raw,
)
from holoscene_tpu.models.holoscene import (
    HoloSceneConfig,
    render_rays,
    render_rays_only_multi_obj,
)
from holoscene_tpu.training.stage1 import make_optimizer, rays_from_batch


def sdf_constraint_loss(params, cfg: HoloSceneConfig, obj_i: int,
                        pts: jnp.ndarray, target_sdf: jnp.ndarray,
                        mode: str = "contain"):
    """SDF point constraints (model/network.py:973-1013).

    contain: object must stay OUT of the region where target (parent) is
             solid: penalize -sdf_obj(x) > sdf_target(x) (x5 + eikonal x0.1)
    maintain: object must not grow past its recorded sdf:
             penalize sdf_obj(x) > target (x3 + eikonal x0.1)
    match:   |sdf_obj - target| (x10 + eikonal x0.1)
    """
    raw = implicit_sdf_raw(params["implicit"], cfg.implicit, pts)
    s = raw[:, obj_i]
    t = target_sdf.reshape(-1)
    if mode == "contain":
        delta = -s - t
        w = 5.0
    elif mode == "maintain":
        delta = s - t
        w = 3.0
    else:
        delta = jnp.abs(t - s)
        w = 10.0
    if mode == "match":
        loss_sdf = jnp.mean(delta)
    else:
        viol = delta > 0
        cnt = jnp.sum(viol)
        loss_sdf = jnp.where(
            cnt > 0, jnp.sum(jnp.where(viol, delta, 0.0)) / jnp.maximum(cnt, 1),
            0.0,
        )

    jac = implicit_all_gradients(params["implicit"], cfg.implicit, pts)
    g = jac[:, obj_i, :]
    loss_eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
    return w * loss_sdf + 0.1 * loss_eik


def invisible_view_loss(
    params,
    cfg: HoloSceneConfig,
    key: jax.Array,
    obj_idxs: tuple[int, ...],
    pose_c2w: jnp.ndarray,
    half_extent: jnp.ndarray,
    gen_rgb: jnp.ndarray,     # [M, 3] sampled pixels
    gen_normal: jnp.ndarray,  # [M, 3] camera-frame
    gen_mask: jnp.ndarray,    # [M]
    uv_unit: jnp.ndarray,     # [M, 2] in [-1, 1]
    gen_nm_mask: jnp.ndarray | None = None,  # [M] normal-validity mask
    rgb_weight: float = 1.0,
    normal_weight: float = 0.5,
    mask_weight: float = 0.5,
):
    """Supervise the object's isolated orthographic render against one
    generated view (calculate_invisible_loss, holoscene_train_post.py:458).
    `gen_nm_mask` restricts the normal term to pixels whose inpainted
    normals passed the consistency gate (reference nm_mask,
    holoscene_train_post.py:1085-1112); defaults to gen_mask."""
    # orthographic rays with a traced half-extent (get_orthographic_rays
    # takes a static extent, so build them inline)
    rays_o = pose_c2w[:3, 3][None, :] + (
        uv_unit[:, 0:1] * half_extent * pose_c2w[:3, 0][None, :]
        + uv_unit[:, 1:2] * half_extent * pose_c2w[:3, 1][None, :]
    )
    rays_d = jnp.broadcast_to(pose_c2w[:3, 2][None, :], rays_o.shape)
    depth_scale = jnp.ones((rays_o.shape[0], 1))
    w2c = pose_c2w[:3, :3].T
    out = render_rays_only_multi_obj(
        params, cfg, key, rays_o, rays_d, depth_scale, w2c, obj_idxs,
        training=True, detach_rgb_geometry=True,
    )
    m = gen_mask.reshape(-1, 1)
    mn = m if gen_nm_mask is None else gen_nm_mask.reshape(-1, 1)
    rgb_l = jnp.sum(jnp.abs(out["rgb_values"] - gen_rgb) * m) / (
        jnp.maximum(m.sum() * 3, 1.0)
    )
    n_pred = safe_normalize(out["normal_map"])
    n_gt = safe_normalize(gen_normal)
    normal_l = jnp.sum((1.0 - jnp.sum(n_pred * n_gt, -1, keepdims=True)) * mn) / (
        jnp.maximum(mn.sum(), 1.0)
    )
    acc = jnp.clip(out["acc"], 1e-4, 1 - 1e-4)
    mask_l = jnp.mean(
        -(m[:, 0] * jnp.log(acc) + (1 - m[:, 0]) * jnp.log(1 - acc))
    )
    return rgb_weight * rgb_l + normal_weight * normal_l + mask_weight * mask_l


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    iters: int = 500
    lr: float = 5e-4
    lr_factor_for_grid: float = 20.0
    rays_per_step: int = 512
    invis_pixels: int = 512
    collision_pts: int = 1024
    invis_weight: float = 1.0
    collision_weight: float = 1.0


def make_object_finetune_step(
    cfg: HoloSceneConfig,
    lcfg: LossConfig,
    fcfg: FinetuneConfig,
    obj_i: int,
):
    """Jitted per-object refinement step. Inputs per call:
      batch       — class-targeted ray batch (stage-1 layout)
      gen_view    — dict(pose [4,4], half_extent [], rgb/normal [M,3],
                    mask [M], uv [M,2]) or None-like zeros w/ weight 0
      coll_pts    — [P, 3] constraint points
      coll_sdf    — [P] recorded parent/self sdf targets
      coll_mode   — static: 'contain' | 'maintain' | 'match'
    """
    optimizer = make_optimizer(fcfg.lr, fcfg.lr_factor_for_grid, fcfg.iters)

    @partial(jax.jit, static_argnames=("use_invis", "coll_mode"),
             donate_argnums=(0, 1))
    def step(params, opt_state, key, batch, gen_view, invis_on,
             coll_pts, coll_sdf, use_invis: bool, coll_mode: str):
        k1, k2, k3 = jax.random.split(key, 3)

        def loss_fn(p):
            rays_o, rays_d, dscale, w2c = rays_from_batch(
                batch["uv"], batch["pose"], batch["intrinsics"], k1
            )
            out = render_rays(p, cfg, k2, rays_o, rays_d, dscale, w2c,
                              training=True)
            gt = {k: batch[k] for k in ("rgb", "depth", "normal", "segs", "mask")}
            losses = holoscene_loss(out, gt, lcfg, step=0, call_reg=False)
            total = losses["loss"]

            if use_invis:
                inv = invisible_view_loss(
                    p, cfg, k3, (obj_i,), gen_view["pose"],
                    gen_view["half_extent"], gen_view["rgb"],
                    gen_view["normal"], gen_view["mask"], gen_view["uv"],
                    gen_nm_mask=gen_view.get("nm_mask"),
                )
                total = total + fcfg.invis_weight * invis_on * inv
                losses = {**losses, "invis_loss": inv}

            coll = sdf_constraint_loss(p, cfg, obj_i, coll_pts, coll_sdf,
                                       mode=coll_mode)
            total = total + fcfg.collision_weight * coll
            return total, {**losses, "collision_loss": coll, "loss": total}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step, optimizer


def sample_collision_points(
    params,
    cfg: HoloSceneConfig,
    bbox_center: np.ndarray,
    bbox_scale: np.ndarray,
    parent_ids: tuple[int, ...],
    n_pts: int,
    rng: np.random.Generator,
):
    """Grid/uniform samples in the object's bbox with the PARENT SDF frozen
    as the constraint target (holoscene_train_post.py:3620-3700)."""
    pts = rng.uniform(-1, 1, (n_pts, 3)) * bbox_scale[None] + bbox_center[None]
    pts_j = jnp.asarray(pts, dtype=jnp.float32)
    raw = implicit_sdf_raw(
        jax.lax.stop_gradient(params["implicit"]), cfg.implicit, pts_j
    )
    target = raw[:, list(parent_ids)].min(axis=-1)
    return pts_j, jax.lax.stop_gradient(target)
