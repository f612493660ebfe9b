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
    nm_l1_weight: float = 0.0,
    inp_mask: jnp.ndarray | None = None,  # [M] 1 = LaMa-inpainted pixel
    lama_rgb_weight: float | None = None,
    lama_nm_weight: float | None = None,
    lama_nm_l1_weight: float | None = None,
    gen_depth: jnp.ndarray | None = None,     # [M] ortho-frame depth
    gen_depth_mask: jnp.ndarray | None = None,  # [M] depth-validity mask
    depth_weight: float = 0.0,
    mask_boost: jnp.ndarray | float | None = None,  # 25 on FRONT views (:566)
):
    """Supervise the object's isolated orthographic render against one
    generated view (calculate_invisible_loss, holoscene_train_post.py:458).
    `gen_nm_mask` restricts the normal term to pixels whose inpainted
    normals passed the consistency gate (reference nm_mask,
    holoscene_train_post.py:1085-1112); defaults to gen_mask.

    Per-pixel weighting mirrors the reference invis_loss conf section
    (confs/replica/room_0/replica_room_0_post.conf invis_loss{}): visible
    pixels use lambda_rgb / lambda_nm_{l1,cos}, LaMa-inpainted pixels
    (`inp_mask`, the reference's sm_mask) use the lambda_lama_* variants
    (holoscene_train_post.py:458-560). When the lama weights are None the
    base weights apply everywhere (round-1 behavior)."""
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
    # per-pixel weight maps: base weight on visible pixels, lama weight on
    # inpainted ones (inp==1). With no inp_mask/lama weights this reduces
    # to a constant base weight.
    inp = jnp.zeros_like(m) if inp_mask is None else inp_mask.reshape(-1, 1)

    def blend(base, lama):
        if lama is None:
            return base * jnp.ones_like(m)
        return base * (1.0 - inp) + lama * inp

    w_rgb = blend(rgb_weight, lama_rgb_weight)
    w_nm = blend(normal_weight, lama_nm_weight)
    w_nl1 = blend(nm_l1_weight, lama_nm_l1_weight)
    rgb_l = jnp.sum(jnp.abs(out["rgb_values"] - gen_rgb) * m * w_rgb) / (
        jnp.maximum(m.sum() * 3, 1.0)
    )
    n_pred = safe_normalize(out["normal_map"])
    n_gt = safe_normalize(gen_normal)
    normal_l = jnp.sum(
        (1.0 - jnp.sum(n_pred * n_gt, -1, keepdims=True)) * mn * w_nm
    ) / jnp.maximum(mn.sum(), 1.0)
    nm_l1_l = jnp.sum(jnp.abs(n_pred - n_gt) * mn * w_nl1) / (
        jnp.maximum(mn.sum() * 3, 1.0)
    )
    # opacity supervision is MSE like the reference (:584/:604), not BCE —
    # the conf lambdas are tuned for it
    mask_l = jnp.mean((out["acc"].reshape(-1) - m[:, 0]) ** 2)
    if mask_boost is not None:
        mask_l = mask_l * mask_boost
    total = rgb_l + normal_l + nm_l1_l + mask_weight * mask_l
    if gen_depth is not None:
        md = (m if gen_depth_mask is None
              else gen_depth_mask.reshape(-1, 1))
        depth_l = jnp.sum(
            jnp.abs(out["depth_values"].reshape(-1, 1) - gen_depth.reshape(-1, 1))
            * md
        ) / jnp.maximum(md.sum(), 1.0)
        total = total + depth_weight * depth_l
    return total


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
    # invisible-view per-term weights; the reference carries these in the
    # post confs' invis_loss{} section (confs/replica/room_0/
    # replica_room_0_post.conf: lambda_rgb/nm_l1/nm_cos/mask + lambda_lama_*
    # variants for inpainted pixels, num_rays). Defaults = round-1 behavior.
    rgb_weight: float = 1.0
    nm_cos_weight: float = 0.5
    nm_l1_weight: float = 0.0
    mask_weight: float = 0.5
    depth_weight: float = 0.0
    lama_rgb_weight: float | None = None
    lama_nm_cos_weight: float | None = None
    lama_nm_l1_weight: float | None = None
    # background-reconstruction normal/depth weights (reference bg_nm_l1 /
    # bg_nm_cos / bg_depth in invis_loss{}, holoscene_train_post.py:668-671);
    # None keeps the stage-1 loss weights
    bg_nm_l1: float | None = None
    bg_nm_cos: float | None = None
    bg_depth: float | None = None
    # lambda_smooth: smoothness weight during the finetune steps (replaces
    # the stage-1 loss{} smooth_weight when set — the reference carries it
    # in the invis_loss{} section)
    smooth_weight: float | None = None

    @classmethod
    def from_conf(cls, conf, **overrides):
        """Build from a post conf's invis_loss{} section (reference key
        names; holoscene_train_post.py consumes the same section). Absent
        section/keys keep the dataclass defaults."""
        kw = dict(overrides)
        if "invis_loss" in conf:
            s = conf.get_config("invis_loss")
            remap = {
                "lambda_rgb": "rgb_weight",
                "lambda_nm_cos": "nm_cos_weight",
                "lambda_nm_l1": "nm_l1_weight",
                "lambda_mask": "mask_weight",
                "lambda_depth": "depth_weight",
                "lambda_lama_rgb": "lama_rgb_weight",
                "lambda_lama_nm_cos": "lama_nm_cos_weight",
                "lambda_lama_nm_l1": "lama_nm_l1_weight",
                "bg_nm_l1": "bg_nm_l1",
                "bg_nm_cos": "bg_nm_cos",
                "bg_depth": "bg_depth",
                "lambda_smooth": "smooth_weight",
            }
            for src, dst in remap.items():
                if src in s and dst not in kw:
                    kw[dst] = s.get_float(src)
            if "num_rays" in s and "invis_pixels" not in kw:
                kw["invis_pixels"] = s.get_int("num_rays")
        return cls(**kw)


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
    if fcfg.smooth_weight is not None:  # invis_loss{} lambda_smooth
        lcfg = dataclasses.replace(lcfg, smooth_weight=fcfg.smooth_weight)
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
                    rgb_weight=fcfg.rgb_weight,
                    normal_weight=fcfg.nm_cos_weight,
                    mask_weight=fcfg.mask_weight,
                    nm_l1_weight=fcfg.nm_l1_weight,
                    inp_mask=gen_view.get("inp_mask"),
                    lama_rgb_weight=fcfg.lama_rgb_weight,
                    lama_nm_weight=fcfg.lama_nm_cos_weight,
                    lama_nm_l1_weight=fcfg.lama_nm_l1_weight,
                    gen_depth=gen_view.get("depth"),
                    gen_depth_mask=gen_view.get("depth_mask"),
                    depth_weight=fcfg.depth_weight,
                    mask_boost=gen_view.get("mask_boost"),
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
