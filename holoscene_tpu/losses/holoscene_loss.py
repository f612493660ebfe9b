"""Stage-1/2 loss stack: MonoSDF terms + HoloScene object-compositional terms.

Reference semantics: model/loss.py (MonoSDFLoss :196-346, HoloSceneLoss
:349-666). All reductions are implemented as masked sums/counts so shapes
stay static under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    rgb_loss: str = "l1"               # 'l1' | 'mse'
    eikonal_weight: float = 0.1
    smooth_weight: float = 0.005
    depth_weight: float = 0.1
    normal_l1_weight: float = 0.05
    normal_cos_weight: float = 0.05
    semantic_weight: float = 0.04
    use_obj_opacity: bool = True
    reg_vio_weight: float = 0.1
    bg_reg_weight: float = 0.1
    end_step: int = -1

    @classmethod
    def from_conf(cls, conf) -> "LossConfig":
        rgb = conf.get_string("rgb_loss", "torch.nn.L1Loss")
        return cls(
            rgb_loss="mse" if "MSE" in rgb else "l1",
            eikonal_weight=conf.get_float("eikonal_weight", 0.1),
            smooth_weight=conf.get_float("smooth_weight", 0.005),
            depth_weight=conf.get_float("depth_weight", 0.1),
            normal_l1_weight=conf.get_float("normal_l1_weight", 0.05),
            normal_cos_weight=conf.get_float("normal_cos_weight", 0.05),
            semantic_weight=conf.get_float("semantic_weight", 0.04),
            use_obj_opacity=conf.get_bool("use_obj_opacity", True),
            reg_vio_weight=conf.get_float("reg_vio_weight", 0.1),
            bg_reg_weight=conf.get_float("bg_reg_weight", 0.1),
            end_step=conf.get_int("end_step", -1),
        )


def safe_normalize(v: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normalize with NaN-free gradients at v = 0 (jnp.linalg.norm's gradient
    at the origin is NaN; sqrt(sum + eps^2) is smooth everywhere)."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(mask)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(cnt, 1), 0.0)


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray, kind: str = "l1") -> jnp.ndarray:
    if kind == "mse":
        return jnp.mean((pred - gt) ** 2)
    return jnp.mean(jnp.abs(pred - gt))


def eikonal_loss(grad_theta: jnp.ndarray) -> jnp.ndarray:
    """grad_theta [..., 3]: mean (|g| - 1)^2 (loss.py:232-234)."""
    norms = jnp.linalg.norm(grad_theta, axis=-1)
    return jnp.mean((norms - 1.0) ** 2)


def smooth_loss(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    """Unisurf smoothness: ||n(x) - n(x+eps)|| (loss.py:236-244).

    g1/g2: [..., 3] gradients at points and their perturbed neighbours
    (same trailing layout: we pair per point per object)."""
    n1 = safe_normalize(g1, 1e-5)
    n2 = safe_normalize(g2, 1e-5)
    return jnp.mean(jnp.sqrt(jnp.sum((n1 - n2) ** 2, axis=-1) + 1e-12))


def scale_shift_solve(pred: jnp.ndarray, gt: jnp.ndarray):
    """Closed-form 1-D least squares: argmin_{w,q} ||w*pred + q - gt||^2
    (loss.py:181-193, B=1 whole-batch system as used at loss.py:263-265)."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    n = pred.shape[0]
    sx = pred.sum()
    sxx = (pred * pred).sum()
    sy = gt.sum()
    sxy = (pred * gt).sum()
    det = sxx * n - sx * sx
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    w = (n * sxy - sx * sy) / det
    q = (sxx * sy - sx * sxy) / det
    return w, q


def depth_loss(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray) -> jnp.ndarray:
    """Scale-shift-invariant depth loss, clipped at 1 (loss.py:246-277)."""
    w, q = scale_shift_solve(depth_pred, depth_gt)
    diff = ((w * depth_pred.reshape(-1) + q) - depth_gt.reshape(-1)) ** 2
    return jnp.mean(jnp.clip(diff, max=1.0))


def normal_loss(normal_pred: jnp.ndarray, normal_gt: jnp.ndarray):
    """L1 + cosine on normalized normals (loss.py:279-288). Caller pre-masks
    normal_pred by multiplication, as the reference does (loss.py:317)."""
    ng = safe_normalize(normal_gt)
    np_ = safe_normalize(normal_pred)
    l1 = jnp.mean(jnp.abs(np_ - ng).sum(axis=-1))
    cos = jnp.mean(1.0 - jnp.sum(np_ * ng, axis=-1))
    return l1, cos


def object_opacity_loss(predict_opacity: jnp.ndarray, gt_seg: jnp.ndarray):
    """Occlusion-aware opacity BCE vs one-hot instance id (loss.py:487-492).

    predict_opacity [R, K]; gt_seg [R] int instance ids."""
    k = predict_opacity.shape[1]
    target = jax.nn.one_hot(gt_seg.reshape(-1), k)
    p = jnp.clip(predict_opacity, 1e-4, 1.0 - 1e-4)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(bce.mean(axis=-1))


def object_distinct_loss(sample_sdf: jnp.ndarray, min_sdf: jnp.ndarray):
    """Inter-object penetration regularizer (loss.py:389-404).

    sample_sdf [N, K]; min_sdf [N]. Penalizes -sdf_j exceeding -min_sdf for
    every non-argmin object (i.e. two objects both 'inside')."""
    n, k = sample_sdf.shape
    min_idx = jnp.argmin(sample_sdf, axis=1)
    viol = jax.nn.relu(-sample_sdf - jax.lax.stop_gradient(min_sdf)[:, None])
    not_min = jnp.arange(k)[None, :] != min_idx[:, None]
    active = not_min & (viol > 0)
    return _masked_mean(viol, active)


def object_distinct_graph_loss(
    sample_sdf: jnp.ndarray,
    obj_i: int,
    parent_id: int,
    desc_ids: tuple[int, ...],
    bother_groups: tuple[tuple[int, ...], ...],
):
    """Scene-graph-aware collision regularizer (loss.py:406-484).

    parent: points inside the parent must not be inside self/descendants;
    desc:   points inside self must not be inside descendants;
    bother: sibling groups must not overlap each other.
    Static graph structure (python ints/tuples) — jit-compiled per object.
    """
    n = sample_sdf.shape[0]
    zero = jnp.asarray(0.0)

    parent_loss = zero
    if parent_id >= 0:
        sel = sample_sdf[:, [parent_id, obj_i, *desc_ids]]
        inside = sel[:, 0] < 0
        viol = -sel[:, 1:] - jax.lax.stop_gradient(sel[:, 0:1])
        active = inside[:, None] & (viol > 0)
        parent_loss = _masked_mean(viol, active)

    desc_loss = zero
    if len(desc_ids) > 0:
        sel = sample_sdf[:, [obj_i, *desc_ids]]
        inside = sel[:, 0] < 0
        viol = -sel[:, 1:] - jax.lax.stop_gradient(sel[:, 0:1])
        active = inside[:, None] & (viol > 0)
        desc_loss = _masked_mean(viol, active)

    bother_loss = zero
    if len(bother_groups) > 0:
        groups = [list((obj_i, *desc_ids))] + [list(g) for g in bother_groups]
        mins = jnp.stack([sample_sdf[:, g].min(axis=1) for g in groups], axis=1)
        min_val = mins.min(axis=1, keepdims=True)
        min_idx = jnp.argmin(mins, axis=1)
        inside = min_val[:, 0] < 0
        viol = jax.nn.relu(-mins - jax.lax.stop_gradient(min_val))
        not_min = jnp.arange(mins.shape[1])[None, :] != min_idx[:, None]
        active = inside[:, None] & not_min & (viol > 0)
        bother_loss = _masked_mean(viol, active)

    return parent_loss, desc_loss, bother_loss


def multiscale_grad_error(x: jnp.ndarray, mask: jnp.ndarray, scales: int = 4):
    """Multi-scale masked gradient smoothness (loss.py:515-547).

    x [C, H, W]; mask [C, H, W] (already broadcast)."""
    total = jnp.asarray(0.0)
    for i in range(scales):
        step = 2 ** i
        xs = x[:, ::step, ::step]
        ms = mask[:, ::step, ::step]
        m_cnt = jnp.sum(ms[:1])
        diff = ms * xs
        gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (ms[:, :, 1:] * ms[:, :, :-1])
        gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (ms[:, 1:, :] * ms[:, :-1, :])
        scale_loss = jnp.where(
            m_cnt > 0, (gx.sum() + gy.sum()) / jnp.maximum(m_cnt, 1.0), 0.0
        )
        total = total + scale_loss
    return total


def bg_render_loss(bg_depth: jnp.ndarray, bg_normal: jnp.ndarray, mask: jnp.ndarray,
                   patch: int = 32):
    """Background depth+normal smoothness over a square patch (loss.py:495-506)."""
    d = bg_depth.reshape(1, patch, patch)
    n = bg_normal.reshape(patch, patch, 3).transpose(2, 0, 1)
    m = mask.reshape(1, patch, patch).astype(d.dtype)
    return multiscale_grad_error(d, m) + multiscale_grad_error(
        n, jnp.broadcast_to(m, n.shape)
    )


def holoscene_loss(
    model_outputs: dict,
    ground_truth: dict,
    cfg: LossConfig,
    step: jnp.ndarray | int = 0,
    call_reg: bool = False,
    graph_relations: dict | None = None,
) -> dict[str, jnp.ndarray]:
    """Full Stage-1 loss (loss.py:290-346 + :611-666).

    ground_truth keys: rgb [R,3], depth [R,1], normal [R,3], segs [R],
    mask [R,1] (fg mask for normal supervision).
    """
    out: dict[str, jnp.ndarray] = {}

    out["rgb_loss"] = rgb_loss(
        model_outputs["rgb_values"], ground_truth["rgb"].reshape(-1, 3), cfg.rgb_loss
    )

    if "grad_theta" in model_outputs:
        out["eikonal_loss"] = eikonal_loss(model_outputs["grad_theta"])
        out["smooth_loss"] = smooth_loss(
            model_outputs["grad_theta"], model_outputs["grad_theta_nei"]
        )
    else:
        out["eikonal_loss"] = jnp.asarray(0.0)
        out["smooth_loss"] = jnp.asarray(0.0)

    # foreground-only normal supervision mask (loss.py:308-311)
    sdf = model_outputs["sdf"]
    sign_change = jnp.any(sdf > 0, axis=-1) & jnp.any(sdf < 0, axis=-1)
    mask = (ground_truth["mask"].reshape(-1) > 0.5) & sign_change

    out["depth_loss"] = (
        depth_loss(model_outputs["depth_values"], ground_truth["depth"])
        if cfg.depth_weight > 0
        else jnp.asarray(0.0)
    )

    normal_pred = model_outputs["normal_map"] * mask[:, None]
    out["normal_l1"], out["normal_cos"] = normal_loss(
        normal_pred, ground_truth["normal"]
    )

    decay = (
        jnp.exp(-jnp.asarray(step, jnp.float32) / cfg.end_step * 10.0)
        if cfg.end_step > 0
        else 1.0
    )

    loss = (
        out["rgb_loss"]
        + cfg.eikonal_weight * out["eikonal_loss"]
        + cfg.smooth_weight * out["smooth_loss"]
        + decay * cfg.depth_weight * out["depth_loss"]
        + decay * cfg.normal_l1_weight * out["normal_l1"]
        + decay * cfg.normal_cos_weight * out["normal_cos"]
    )

    # semantic / object-opacity term (loss.py:615-622)
    if cfg.use_obj_opacity and "object_opacity" in model_outputs:
        out["semantic_loss"] = object_opacity_loss(
            model_outputs["object_opacity"], ground_truth["segs"]
        )
    elif "semantic_values" in model_outputs:
        sem = model_outputs["semantic_values"]
        logp = jax.nn.log_softmax(sem, axis=-1)
        out["semantic_loss"] = -jnp.mean(
            jnp.take_along_axis(logp, ground_truth["segs"].reshape(-1, 1), axis=-1)
        )
    else:
        out["semantic_loss"] = jnp.asarray(0.0)

    # collision regularizer (loss.py:624-642)
    if call_reg and "sample_sdf" in model_outputs:
        if graph_relations is not None:
            p, d, b = object_distinct_graph_loss(
                model_outputs["sample_sdf"],
                graph_relations["obj_i"],
                graph_relations["parent"],
                tuple(graph_relations["desc"]),
                tuple(tuple(g) for g in graph_relations["bother"]),
            )
            out["collision_reg_loss"] = p + d + b
        else:
            out["collision_reg_loss"] = object_distinct_loss(
                model_outputs["sample_sdf"], model_outputs["sample_minsdf"]
            )
    else:
        out["collision_reg_loss"] = jnp.asarray(0.0)

    # background smoothness regularizer (loss.py:645-652)
    if "bg_depth_values" in model_outputs:
        if "bg_mask" in model_outputs:
            bg_mask = model_outputs["bg_mask"] != 0
        else:
            bg_mask = ground_truth["segs"].reshape(-1, 1) != 0
        out["background_reg_loss"] = bg_render_loss(
            model_outputs["bg_depth_values"], model_outputs["bg_normal_map"], bg_mask
        )
    else:
        out["background_reg_loss"] = jnp.asarray(0.0)

    loss = (
        loss
        + cfg.semantic_weight * out["semantic_loss"]
        + cfg.reg_vio_weight * out["collision_reg_loss"]
        + cfg.bg_reg_weight * out["background_reg_loss"]
    )
    out["loss"] = loss
    return out
