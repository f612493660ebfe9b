"""Stage-4 (Gaussian-on-Mesh) data parallelism over a device mesh.

The reference's 3dgrut trainer is strictly single-GPU (SURVEY.md §2.4);
the TPU-native scaling story for splat training shards the *frame* axis:
each device renders a different training camera through the full flat-path
pipeline (gathers + Pallas tile walks run UNSHARDED per device — the
kernels never see a batch dim), local grads are `pmean`ed over ICI, and
the (replicated) optimizer update is applied once outside the shard_map.

Why shard_map and not GSPMD annotations: the tile-walk Pallas kernels use
scalar prefetch + manual DMA; under shard_map each device executes the
kernel exactly as the single-chip path does, so there is no reliance on
GSPMD partitioning a pallas_call. Gradient averaging over `data` is the
only collective (one psum of the gaussian param tree per step).

Batching semantics: a dp-B step averages gradients over B distinct frames
(standard data parallelism) — equivalent to a single-device step on the
same B-frame minibatch (tests/test_stage4_dp.py asserts this numerically).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stage4_batch_sharding(mesh: Mesh):
    """Per-frame batch tensors: leading (frame) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def make_stage4_dp_step(mesh: Mesh, optimizer, static_host: dict, cfg,
                        flat_plan, loss_scale: float,
                        width: int, height: int):
    """Build the dp-sharded stage-4 train step.

    Returns step(static_arr, params, opt_state, keys, poses, intrs, images,
    acms, mesh_depths, bins) -> (params, opt_state, metrics, used [B, T],
    stale [B]).

    All per-frame inputs carry a leading B axis sharded over `data`
    (B = mesh.shape['data']); images are channels-major [B, 3, H, W];
    params / opt_state / static_arr replicate.
    `bins`: the per-frame cached index plans (models/gom.gom_flat_bins)
    stacked along axis 0 when cfg uses the flat path (flat_plan given),
    else the argument is ignored (pass None).
    """
    from holoscene_tpu.models.gom import gom_loss, gom_scales, render_gom

    rep, shd = P(), P("data")

    def per_frame_loss(params, static, key, pose, intr, image, acm,
                       mesh_depth, bins):
        # image is channels-major [3, H, W] — the trainer step's layout
        # (training/stage4.py step_fn; avoids the [*, 3] lane padding)
        bg = jax.random.uniform(key, (3,))
        out = render_gom(params, static, cfg, pose, intr, width, height, bg,
                         flat_plan=flat_plan, flat_bins=bins, chw=True)
        batch = {
            "image": image * acm[None] + (1 - acm[None]) * bg[:, None, None],
            "acm": acm,
            "mesh_depth": mesh_depth,
            "mask": None,
        }
        losses = gom_loss(out, batch, cfg,
                          with_scale_reg=cfg.use_scale_regularization,
                          scales_linear=gom_scales(params, static, cfg),
                          chw=True)
        total = losses["main_loss"] * loss_scale + losses["scale_reg"]
        psnr = -10.0 * jnp.log10(jnp.mean((out["rgb"] - image) ** 2) + 1e-12)
        if flat_plan is not None:
            used, stale = out["used_chunks"], out["stale"]
        else:
            used = jnp.zeros((), jnp.int32)
            stale = jnp.zeros((), jnp.int32)
        return total, (losses, psnr, used, stale)

    def shard_body(static, params, keys, poses, intrs, images, acms,
                   mesh_depths, bins):
        # each device holds ONE frame: strip the local leading axis of 1
        sq = partial(jax.tree_util.tree_map, lambda x: x[0])
        (total, (losses, psnr, used, stale)), grads = jax.value_and_grad(
            per_frame_loss, has_aux=True
        )(params, static, keys[0], sq(poses), sq(intrs), sq(images),
          sq(acms), sq(mesh_depths), sq(bins) if bins is not None else None)
        grads = jax.lax.pmean(grads, "data")
        mean = partial(jax.lax.pmean, axis_name="data")
        metrics = {**jax.tree_util.tree_map(mean, losses),
                   "loss": mean(total), "psnr": mean(psnr)}
        return grads, metrics, used[None], stale[None]

    with_bins = flat_plan is not None

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(static_arr, params, opt_state, keys, poses, intrs, images,
             acms, mesh_depths, bins=None):
        static = {**static_host, **static_arr}
        body = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(rep, rep, shd, shd, shd, shd, shd, shd,
                      shd if with_bins else rep),
            out_specs=(rep, rep, shd, shd),
            check_vma=False,
        )
        grads, metrics, used, stale = body(
            static, params, keys, poses, intrs, images, acms, mesh_depths,
            bins if with_bins else None)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, used, stale

    return step
