"""Stage-1 runner: object-compositional neural-SDF scene reconstruction.

Reference semantics: training/holoscene_train.py (`HoloSceneTrainRunner`) —
conf-driven experiment layout (exps/<expname>/<timestamp>/{checkpoints,plots}),
d_out derived from the dataset's instance count (:119-122), Adam with a
separate (x`lr_factor_for_grid`) learning rate for hash-grid tables and
exponential 0.1^(1/total_iters) decay (:156-169), per-iteration
semantic-balanced ray batches, object-violation regularizer enabled after
`add_objectvio_iter` (:358), background-patch regularizer every
`render_bg_iter` iterations, periodic eval renders + checkpoints.

TPU-first design: the entire training step — ray generation, error-bounded
sampling, field evaluation, losses, Adam update — is ONE jitted function
with static shapes, optionally sharded over a (data, model) device mesh
(rays split over `data`, params replicated/TP-sharded; GSPMD inserts the
grad all-reduce). The host only samples pixel indices and streams numpy
batches. Train-step variants (with/without collision reg, with/without
bg-patch reg) are compiled lazily and cached.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from holoscene_tpu.config import Config
from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss
from holoscene_tpu.models.holoscene import (
    HoloSceneConfig,
    init_holoscene,
    render_bg_patch,
    render_rays,
)
from holoscene_tpu.ops.rays import get_camera_rays
from holoscene_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from holoscene_tpu.training import checkpoints as ckpt_lib


def make_optimizer(lr: float, lr_factor_for_grid: float, total_iters: int):
    """Adam(0.9, 0.99, eps=1e-15) with x-factor grid LR and exponential decay
    (reference holoscene_train.py:156-169)."""
    decay = 0.1 ** (1.0 / max(total_iters, 1))

    def adam(peak_lr):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_learning_rate(
                optax.exponential_decay(peak_lr, transition_steps=1, decay_rate=decay)
            ),
        )

    def label_fn(params):
        def label(path, _):
            name = "/".join(
                str(p.key) if hasattr(p, "key") else str(p) for p in path
            )
            return "grid" if name.endswith("grid") else "net"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"grid": adam(lr * lr_factor_for_grid), "net": adam(lr)}, label_fn
    )


def rays_from_batch(uv, pose, intrinsics, key=None):
    """Pixel batch -> world rays (+0.5-pixel jitter when key given,
    reference network.py:784-792)."""
    offset = None
    if key is not None:
        offset = jax.random.uniform(key, uv.shape) - 0.5
    dirs, cam_loc, depth_scale = get_camera_rays(uv, pose, intrinsics, offset)
    rays_o = jnp.broadcast_to(cam_loc, dirs.shape)
    w2c_rot = pose[:3, :3].T
    return rays_o, dirs, depth_scale, w2c_rot


def make_train_step(cfg: HoloSceneConfig, lcfg: LossConfig, optimizer,
                    bg_patch_size: int = 32):
    """Build the jitted train step family.

    Returns step(params, opt_state, key, batch, step_idx, *, call_reg,
    with_bg_reg) -> (params, opt_state, metrics). Static flags select the
    compiled variant.

    occ (optional occupancy grid, ops/occupancy.py): when passed, the
    sampler restricts each ray to its occupied span and the step returns a
    FOURTH element — the grid, refreshed from the sampler's probe buffer on
    update_occ=True steps (trainers pass i % occ_update_every == 0).
    """

    @partial(jax.jit, static_argnames=("call_reg", "with_bg", "update_occ"),
             donate_argnums=(0, 1))
    def step(params, opt_state, key, batch, step_idx, call_reg: bool,
             with_bg: bool, occ=None, update_occ: bool = False, probe=None):
        k_jit, k_render, k_bg_uv, k_bg = jax.random.split(key, 4)

        def loss_fn(p):
            rays_o, rays_d, dscale, w2c = rays_from_batch(
                batch["uv"], batch["pose"], batch["intrinsics"], k_jit
            )
            out = render_rays(p, cfg, k_render, rays_o, rays_d, dscale, w2c,
                              training=True, occ=occ, update_occ=update_occ,
                              probe=probe)
            occ_new = out.pop("occ", None)
            if with_bg:
                # random bg patch (reference network.py:916-930)
                cx2 = batch["intrinsics"][0, 2] * 2.0
                cy2 = batch["intrinsics"][1, 2] * 2.0
                x0 = jax.random.uniform(k_bg_uv, (2,)) * jnp.stack(
                    [cx2 - bg_patch_size, cy2 - bg_patch_size]
                )
                gy, gx = jnp.mgrid[0:bg_patch_size, 0:bg_patch_size]
                patch_uv = (
                    jnp.stack([gx, gy], -1).reshape(-1, 2).astype(jnp.float32)
                    + x0[None, :]
                )
                po, pd, pscale, pw2c = rays_from_batch(
                    patch_uv, batch["pose"], batch["intrinsics"]
                )
                out.update(
                    render_bg_patch(p, cfg, k_bg, po, pd, pscale, pw2c,
                                    training=True)
                )
            gt = {k: batch[k] for k in ("rgb", "depth", "normal", "segs", "mask")}
            losses = holoscene_loss(out, gt, lcfg, step=step_idx,
                                    call_reg=call_reg)
            psnr = -10.0 * jnp.log10(
                jnp.mean((out["rgb_values"] - gt["rgb"].reshape(-1, 3)) ** 2)
            )
            return losses["loss"], (losses, psnr, occ_new)

        (_, (losses, psnr, occ_new)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # NaN guard: skip the update on non-finite losses (the reference
        # bails out of bad iterations, holoscene_train_post.py:608-623)
        finite = jnp.isfinite(losses["loss"])
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {**losses, "psnr": psnr, "nonfinite": 1.0 - finite,
                   "beta": jnp.abs(params["density"]["beta"]) + cfg.beta_min}
        if occ is None:
            return params, opt_state, metrics
        return params, opt_state, metrics, occ_new

    return step


def make_eval_render(cfg: HoloSceneConfig):
    """Chunked full-frame eval renderer (reference plots via split_n_pixels,
    holoscene_train.py:283-296)."""

    @jax.jit
    def render_chunk(params, uv, pose, intrinsics):
        rays_o, rays_d, dscale, w2c = rays_from_batch(uv, pose, intrinsics)
        out = render_rays(params, cfg, jax.random.PRNGKey(0), rays_o, rays_d,
                          dscale, w2c, training=False, compute_eikonal=False)
        return {
            "rgb_values": out["rgb_values"],
            "depth_values": out["depth_values"],
            "normal_map": out["normal_map"],
            "semantic_values": out["semantic_values"],
            "object_opacity": out["object_opacity"],
        }

    def render_frame(params, sample, chunk: int = 1024):
        uv = np.asarray(sample["uv"])
        n = uv.shape[0]
        pad = (-n) % chunk
        uv_p = np.concatenate([uv, np.tile(uv[-1:], (pad, 1))]) if pad else uv
        outs = []
        for i in range(0, len(uv_p), chunk):
            outs.append(
                jax.tree_util.tree_map(
                    np.asarray,
                    render_chunk(
                        params,
                        jnp.asarray(uv_p[i : i + chunk]),
                        jnp.asarray(sample["pose"]),
                        jnp.asarray(sample["intrinsics"]),
                    ),
                )
            )
        merged = {
            k: np.concatenate([o[k] for o in outs])[:n] for k in outs[0]
        }
        return merged

    return render_frame


class Stage1Runner:
    """Conf-driven Stage-1 training (the reference CLI's behavior)."""

    def __init__(
        self,
        conf: Config,
        exps_folder: str = "exps",
        data_root_override: str | None = None,
        is_continue: bool = False,
        timestamp: str = "latest",
        checkpoint: str = "latest",
        max_total_iters: int | None = None,
        use_mesh: bool = True,
        seed: int = 0,
        quiet: bool = False,
        use_wandb: bool = False,
        use_tensorboard: bool = False,
        expname_suffix: str = "",
        ft_folder: str | None = None,
    ):
        self.conf = conf
        self.quiet = quiet
        # reference appends the CLI --expname to the conf name
        # (holoscene_train.py:56)
        self.expname = conf.get_string("train.expname", "holoscene") + expname_suffix
        self.exps_folder = exps_folder

        dataset_conf = conf.get_config("dataset").as_plain_dict()
        if data_root_override:
            dataset_conf["data_root_dir"] = data_root_override
        dataset_conf.pop("depth_type", None)
        self.dataset = NSDataset(**dataset_conf, seed=seed)

        # d_out follows the dataset's instance count (holoscene_train.py:119-122)
        conf.put("model.implicit_network.d_out", len(self.dataset.label_mapping))

        self.model_cfg = HoloSceneConfig.from_conf(conf.get_config("model"))
        self.loss_cfg = LossConfig.from_conf(conf.get_config("loss"))

        self.num_pixels = conf.get_int("train.num_pixels", 1024)
        self.max_total_iters = (
            max_total_iters
            if max_total_iters is not None
            else conf.get_int("train.max_total_iters", 200000)
        )
        self.stop_iter = min(
            conf.get_int("train.stop_iter", self.max_total_iters),
            self.max_total_iters,
        )
        self.checkpoint_freq = conf.get_int("train.checkpoint_freq", 100)
        # anneal the stochastic one-corner table backward (fields.py
        # color_bwd_sample/sdf_bwd_sample) to exact gradients from this
        # absolute iteration on; -1 = keep the configured mode throughout
        self.exact_bwd_from_iter = conf.get_int("train.exact_bwd_from_iter", -1)
        self.plot_freq = conf.get_int("train.plot_freq", 100)
        self.split_n_pixels = conf.get_int("train.split_n_pixels", 1024)
        self.add_objectvio_iter = conf.get_int("train.add_objectvio_iter", 100000)
        lr = conf.get_float("train.learning_rate", 5e-4)
        lr_grid = conf.get_float("train.lr_factor_for_grid", 1.0)

        # experiment dir layout (holoscene_train.py:58-96)
        self.expdir = os.path.join(exps_folder, self.expname)
        if is_continue and timestamp == "latest":
            timestamp = ckpt_lib.latest_timestamp(self.expdir) or datetime.now().strftime(
                "%Y_%m_%d_%H_%M_%S"
            )
        elif not is_continue:
            timestamp = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        self.timestamp = timestamp
        self.rundir = os.path.join(self.expdir, timestamp)
        self.checkpoints_path = os.path.join(self.rundir, "checkpoints")
        self.plots_dir = os.path.join(self.rundir, "plots")
        os.makedirs(self.checkpoints_path, exist_ok=True)
        os.makedirs(self.plots_dir, exist_ok=True)

        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = init_holoscene(k_init, self.model_cfg)
        self.optimizer = make_optimizer(lr, lr_grid, self.max_total_iters)
        self.opt_state = self.optimizer.init(self.params)
        self.start_iter = 0

        if is_continue or ft_folder is not None:
            # --ft_folder resumes model/optimizer from a FOREIGN run dir into
            # this fresh run (holoscene_train.py:174-199)
            load_dir = (
                os.path.join(ft_folder, "checkpoints")
                if ft_folder is not None
                else self.checkpoints_path
            )
            try:
                self.params, opt_state, meta = ckpt_lib.load_checkpoint(
                    load_dir, self.params, self.opt_state, checkpoint
                )
                if opt_state is not None:
                    self.opt_state = opt_state
                self.start_iter = int(meta.get("step", 0))
            except FileNotFoundError:
                # is_continue with checkpoint='latest' on a run that has no
                # checkpoint yet (first launch under a restart supervisor)
                # = fresh start; a missing EXPLICIT checkpoint or ft_folder
                # stays a loud error (silently restarting at step 0 would
                # overwrite good checkpoints)
                if ft_folder is not None or checkpoint != "latest":
                    raise
                if not quiet:
                    print(f"[stage1] no checkpoint under {load_dir}; "
                          "starting fresh", flush=True)

        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = make_mesh()
            self.params = shard_params(self.mesh, self.params)
            self.opt_state = shard_params(self.mesh, self.opt_state)

        self.train_step = make_train_step(self.model_cfg, self.loss_cfg,
                                          self.optimizer)
        self.render_frame = make_eval_render(self.model_cfg)
        # occupancy-grid sampling restriction (model.use_occupancy conf):
        # the grid is rebuilt from probe evidence within ~1 update cycle, so
        # it is deliberately NOT checkpointed — a resume starts conservative
        # (occupied everywhere) and re-tightens
        self.occ = None
        self.occ_update_every = conf.get_int("train.occ_update_every", 8)
        if self.model_cfg.use_occupancy:
            from holoscene_tpu.ops.occupancy import init_occ_grid

            # EXPERIMENTAL KNOB, deliberately loud: the restriction passed
            # the 2500-iter gate but COLLAPSED the 512²/10k flagship (eval
            # PSNR 24.60 vs 36.91 — PERF.md "FAILED and reverted"), and the
            # duty-cycled full-interval pass that ships as mitigation has
            # only been validated at gate scale. Until a flagship-scale
            # occ+mitigation row lands in PERF.md, treat quality under this
            # knob as unproven beyond 256².
            print("WARNING: model.use_occupancy is an experimental "
                  "sampling-policy knob; its duty-cycle mitigation is "
                  "validated at <=256^2 gate scale only (see PERF.md "
                  "occupancy flagship-collapse post-mortem)", flush=True)
            self.occ = init_occ_grid(self.model_cfg.occupancy)
        # baked probe grid (model.probe_grid_res conf): sampler placement
        # proxy re-baked every probe_update_every steps; like the occupancy
        # grid it is NOT checkpointed — a resume re-bakes at its first step
        self.probe = None
        self._probe_bake = None
        if self.model_cfg.probe_grid_res > 0:
            from holoscene_tpu.models.holoscene import make_probe_bake

            self._probe_bake = make_probe_bake(self.model_cfg)
        self.history: list[dict] = []

        from holoscene_tpu.utils.logging import MetricsLogger

        self.logger = MetricsLogger(
            self.rundir,
            project=conf.get_string("wandb.project_name", "holoscene_tpu"),
            run_name=f"{self.expname}/{self.timestamp}",
            use_wandb=use_wandb,
            use_tensorboard=use_tensorboard,
            config=conf.as_plain_dict(),
        )

        from holoscene_tpu.models.fields import implicit_sdf_raw

        self._sdf_raw_fn = jax.jit(
            lambda p, pts: implicit_sdf_raw(p, self.model_cfg.implicit, pts)
        )

    def extract_meshes(self, resolution: int | None = None, prune: bool = True,
                       epoch: int | None = None, save: bool = True):
        """Per-object mesh extraction + visibility pruning + bbox artifacts
        (reference holoscene_train.py:326-327, :523-641)."""
        from holoscene_tpu.training.pruning import instance_meshes_post_pruning
        from holoscene_tpu.utils.plots import (
            extract_object_meshes,
            generate_bbox,
            save_object_meshes,
        )

        res = resolution or self.conf.get_int("plot.resolution", 256)
        bound = self.conf.get_list("plot.grid_boundary", [-1.0, 1.0])
        params = self.params["implicit"]
        meshes = extract_object_meshes(
            lambda pts: self._sdf_raw_fn(params, pts),
            self.model_cfg.implicit.d_out,
            resolution=res,
            grid_boundary=tuple(bound),
        )
        if prune:
            meshes = instance_meshes_post_pruning(meshes, self.dataset)
        if save:
            epoch = self.start_iter if epoch is None else epoch
            save_object_meshes(meshes, self.plots_dir, epoch)
            generate_bbox(meshes, self.plots_dir)
        return meshes

    def _device_batch(self, sample, gt):
        batch = {
            "uv": jnp.asarray(sample["uv"]),
            "pose": jnp.asarray(sample["pose"]),
            "intrinsics": jnp.asarray(sample["intrinsics"]),
            "rgb": jnp.asarray(gt["rgb"]),
            "depth": jnp.asarray(gt["depth"]),
            "normal": jnp.asarray(gt["normal"]),
            "segs": jnp.asarray(gt["segs"], dtype=jnp.int32),
            "mask": jnp.asarray(gt["mask"]),
        }
        if self.mesh is not None:
            bs = batch_sharding(self.mesh)
            for k in ("uv", "rgb", "depth", "normal", "segs", "mask"):
                batch[k] = jax.device_put(batch[k], bs)
        return batch

    def plot(self, it: int, frame_idx: int = 0, extract_meshes: bool = False,
             split: str = "train"):
        """Plot-cadence artifacts (reference holoscene_train.py:283-353):
        eval-render a frame to PNGs (rgb/normal/depth/instance) and
        optionally extract + prune meshes + bboxes. split="test" renders a
        held-out frame (requires dataset.test_split=true)."""
        from PIL import Image

        sample, gt = self.dataset.full_frame(frame_idx, split=split)
        out = self.render_frame(self.params, sample, chunk=self.split_n_pixels)
        h, w = self.dataset.img_res

        tag = "" if split == "train" else f"_{split}{frame_idx}"

        def save(name, arr):
            Image.fromarray(
                np.clip(arr * 255, 0, 255).astype(np.uint8)
            ).save(os.path.join(self.plots_dir, f"{name}{tag}_{it}.png"))

        save("rendering", out["rgb_values"].reshape(h, w, 3))
        save("normal", (out["normal_map"].reshape(h, w, 3) + 1) / 2)
        d = out["depth_values"].reshape(h, w)
        save("depth", (d - d.min()) / max(d.max() - d.min(), 1e-9))
        inst = np.argmax(out["object_opacity"], axis=-1).reshape(h, w)
        save("instance", inst / max(self.model_cfg.num_semantic - 1, 1))

        psnr = -10 * np.log10(
            np.mean((out["rgb_values"] - gt["rgb"].reshape(-1, 3)) ** 2) + 1e-12
        )
        if not self.quiet:
            print(f"[{self.expname}] plot it={it} {split}-frame={frame_idx} "
                  f"psnr={psnr:.2f}")
        if extract_meshes:
            self.extract_meshes(epoch=it)
        return {"psnr": float(psnr)}

    def switch_to_exact_bwd(self):
        """Re-jit the train step with exact table gradients (disables the
        stochastic one-corner color/SDF-grid backward). Sampling buys
        wall-clock while features move fast; the exact tail recovers the
        last fraction of color detail once they are near-converged
        (train.exact_bwd_from_iter)."""
        import dataclasses

        if not self.model_cfg.implicit.color_bwd_sample:
            return
        self.model_cfg = dataclasses.replace(
            self.model_cfg,
            implicit=dataclasses.replace(
                self.model_cfg.implicit,
                color_bwd_sample=False,
                sdf_bwd_sample=False,
            ),
        )
        self.train_step = make_train_step(self.model_cfg, self.loss_cfg,
                                          self.optimizer)
        if not self.quiet:
            print(f"[{self.expname}] exact table backward from iter "
                  f"{self.exact_bwd_from_iter}", flush=True)

    def run(self, n_iters: int | None = None, log_every: int = 20,
            plot_freq: int | None = None,
            extract_meshes_on_plot: bool = False):
        end = self.start_iter + (n_iters if n_iters is not None else
                                 self.stop_iter - self.start_iter)
        if end <= self.start_iter and not self.quiet:
            print(
                f"[{self.expname}] nothing to do: resumed at iter "
                f"{self.start_iter}, target {end}"
            )
        t0 = time.time()
        rays_done = 0

        # host-side prefetch: ray batches are sampled on a worker thread
        # while the device runs (the reference uses 8 dataloader workers,
        # holoscene_train.py:128; here one thread suffices — sampling is
        # O(batch) after the class-index cache)
        import queue
        import threading

        batch_q: queue.Queue = queue.Queue(maxsize=4)
        n_steps = end - self.start_iter

        def producer():
            try:
                for _ in range(n_steps):
                    batch_q.put(self.dataset.sample_rays(self.num_pixels))
            except BaseException as exc:  # surface in the consumer, not hang
                batch_q.put(exc)

        if n_steps > 0:
            threading.Thread(target=producer, daemon=True).start()

        for it in range(self.start_iter, end):
            item = batch_q.get()
            if isinstance(item, BaseException):
                raise RuntimeError("ray-batch producer thread died") from item
            _, sample, gt = item
            if 0 <= self.exact_bwd_from_iter <= it:
                self.switch_to_exact_bwd()
            batch = self._device_batch(sample, gt)
            self.key, k_step = jax.random.split(self.key)
            call_reg = it >= self.add_objectvio_iter
            with_bg = (
                self.model_cfg.use_bg_reg
                and it % self.model_cfg.render_bg_iter == 0
            )
            if self._probe_bake is not None and (
                    self.probe is None
                    or it % self.model_cfg.probe_update_every == 0):
                self.probe = self._probe_bake(self.params)
            if self.occ is not None:
                self.params, self.opt_state, metrics, self.occ = (
                    self.train_step(
                        self.params, self.opt_state, k_step, batch, it,
                        call_reg=call_reg, with_bg=with_bg, occ=self.occ,
                        update_occ=it % self.occ_update_every == 0,
                        probe=self.probe,
                    )
                )
            else:
                self.params, self.opt_state, metrics = self.train_step(
                    self.params, self.opt_state, k_step, batch, it,
                    call_reg=call_reg, with_bg=with_bg, probe=self.probe,
                )
            rays_done += self.num_pixels

            if it % log_every == 0 or it == end - 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                m["rays_per_sec"] = rays_done / max(dt, 1e-9)
                m["iter"] = it
                self.history.append(m)
                self.logger.log(m, step=it)
                if not self.quiet:
                    print(
                        f"[{self.expname}] it {it} loss={m['loss']:.4f} "
                        f"rgb={m['rgb_loss']:.4f} psnr={m['psnr']:.2f} "
                        f"beta={m['beta']:.4f} rays/s={m['rays_per_sec']:.0f}"
                    )

            if plot_freq and (it + 1) % plot_freq == 0:
                self.plot(it, extract_meshes=extract_meshes_on_plot)

            if (it + 1) % self.checkpoint_freq == 0 or it == end - 1:
                ckpt_lib.save_checkpoint(
                    self.checkpoints_path, epoch=it, params=self.params,
                    opt_state=self.opt_state, extra={"step": it + 1},
                )
        self.start_iter = end
        return self.history
