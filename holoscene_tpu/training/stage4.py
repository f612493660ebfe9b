"""Stage-4 runner: Gaussian-on-Mesh appearance training.

Reference semantics: training/holoscene_train_gaussian.py
(`HoloSceneTrainGaussianRunner`) — GoM seeded from all per-object textured
meshes (surface_{i}.obj), per-instance gaussian index ranges (:465), Adam
with 3DGS per-group learning rates (:479-494: means 1.6e-4, features_dc
2.5e-3, features_rest 2.5e-3/20, opacities 5e-2, scales 5e-3, quats 1e-3)
with exponential 0.1^(1/steps) decay, per-iteration full-frame renders
against GT + mesh-rasterized mask (`acm`) and mesh depth (:550-640, loss
weight main*5.0), eval PSNR/SSIM/LPIPS on train/test splits (:700-860),
export gauss_obj_{i} artifacts (:684-690).

TPU-first differences: the mesh mask/depth for each training frame is
rasterized ONCE and cached (the mesh is frozen during Stage 4 — the
reference re-rasterizes every iteration); the splat render + loss + Adam
update is a single jitted step.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from holoscene_tpu.models.gom import (
    GoMConfig,
    compose_for_export,
    gom_loss,
    gom_scales,
    init_gom_params,
    render_gom,
    seed_gaussians_from_meshes,
    write_gaussian_ply,
)
from holoscene_tpu.ops.rasterizer import rasterize_mesh_list
from holoscene_tpu.utils.eval_rgb import eval_rgb
from holoscene_tpu.utils.mesh import Mesh

GS_LRS = {
    "means_2d": 1.6e-4,
    "normal_elevates": 1.6e-4,
    "features_dc": 2.5e-3,
    "features_rest": 2.5e-3 / 20.0,
    "opacities": 5e-2,
    "scales": 5e-3,
    "quats": 1e-3,
}


def make_gs_optimizer(total_iters: int, lr_scale: float = 1.0):
    decay = 0.1 ** (1.0 / max(total_iters, 1))

    def adam(lr):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_learning_rate(
                optax.exponential_decay(lr * lr_scale, 1, decay)
            ),
        )

    return optax.multi_transform(
        {k: adam(lr) for k, lr in GS_LRS.items()},
        lambda params: {k: k for k in params},
    )


class Stage4Runner:
    def __init__(
        self,
        meshes: list[Mesh],
        dataset,
        cfg: GoMConfig = GoMConfig(),
        area_to_subdivide: float = 1e-5,
        max_total_iters: int | None = None,
        out_dir: str = "stage4_out",
        loss_scale: float = 5.0,
        seed: int = 0,
        quiet: bool = False,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.out_dir = out_dir
        self.loss_scale = loss_scale
        self.quiet = quiet
        os.makedirs(out_dir, exist_ok=True)

        self.static = seed_gaussians_from_meshes(meshes, area_to_subdivide, cfg)
        # jit inputs: the per-gaussian static arrays must enter every jit as
        # ARGUMENTS — closed over, they lower as embedded HLO constants,
        # and at real scale (the r4a chain baked ~500k-face meshes) the
        # compile payload blows past the remote-compile relay's request
        # limit (HTTP 413). Host-side scalars/lists stay closure-bound.
        self._static_arr = {
            k: v for k, v in self.static.items()
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
        }
        self._static_host = {
            k: v for k, v in self.static.items()
            if k not in self._static_arr
        }
        self.meshes = meshes
        self.instance_ranges = self.static["instance_ranges"]
        self.params = init_gom_params(self.static, cfg)

        self.use_flat = (cfg.use_flat if cfg.use_flat is not None
                         else jax.default_backend() == "tpu")
        self.flat_plan = None
        self._flat_margin = 1.3
        self._bins_cache: dict[int, dict] = {}
        self._bins_age: dict[int, int] = {}
        if self.use_flat:
            if cfg.max_per_tile <= 0:
                # the flat path has no K, but the small ortho invis-view
                # renders still ride the top-K compositor — give them a
                # sane depth instead of the auto-calibration's sentinel
                import dataclasses as _dc

                cfg = _dc.replace(cfg, max_per_tile=256)
                self.cfg = cfg
            self._init_flat_plan()

        if cfg.max_per_tile <= 0 and not self.use_flat:
            # auto-K: geometric p99 tile overlap bounds the search; the
            # empirical saturation calibration (render at K vs 2K until the
            # image stops changing) picks the shipped depth — compositing
            # cost is linear in K, and deep tiles are mostly saturated
            import dataclasses as _dc

            from holoscene_tpu.models.gom import gom_means as _means
            from holoscene_tpu.models.gom import gom_quats as _quats
            from holoscene_tpu.models.gom import render_gom as _render
            from holoscene_tpu.ops.splat import (
                auto_max_per_tile,
                calibrate_max_per_tile,
                tile_overlap_counts,
            )

            pose = np.asarray(dataset.pose_all[0])
            intr = np.asarray(dataset.intrinsics[:3, :3])
            h, w = dataset.img_res
            probe_cfg = _dc.replace(cfg, max_per_tile=512)
            counts = tile_overlap_counts(
                _means(self.params, self.static, probe_cfg),
                _quats(self.params, self.static, probe_cfg),
                gom_scales(self.params, self.static, probe_cfg),
                jnp.linalg.inv(jnp.asarray(pose)), jnp.asarray(intr),
                int(w), int(h), tile_size=cfg.tile_size,
            )
            k_geom = auto_max_per_tile(counts)

            def _render_k(k):
                kcfg = _dc.replace(cfg, max_per_tile=int(k))
                return _render(
                    self.params, self.static, kcfg, jnp.asarray(pose),
                    jnp.asarray(intr), int(w), int(h),
                    background=jnp.zeros(3),
                )["rgb"]

            k = calibrate_max_per_tile(_render_k, hi=k_geom)
            cfg = _dc.replace(cfg, max_per_tile=k)
            self.cfg = cfg
            if not quiet:
                print(f"[stage4] auto max_per_tile={k} (saturation-"
                      f"calibrated under the p99 overlap bound {k_geom})")

        n_iters = max_total_iters or 200 * len(meshes)
        self.max_total_iters = n_iters
        self.optimizer = make_gs_optimizer(n_iters)
        self.opt_state = self.optimizer.init(self.params)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.iter_step = 0
        self._mesh_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._chw_cache: dict[int, np.ndarray] = {}
        self.history: list[dict] = []

        self._used_cache: dict[int, "jnp.ndarray"] = {}
        self._trim_active = False
        self.stale_steps = 0  # trimmed-plan truncated renders (log + rebin)
        self.rebin_count = 0  # plan refreshes (adaptive-rebin telemetry)
        self._build_jits()
        self.vis_info_list = [[] for _ in range(len(meshes))]
        # pre-rasterize every frame's mesh mask/depth NOW, while the chip
        # still has headroom: once training steps execute, the workspace +
        # state of a chain-scale run leaves too little HBM for the raster's
        # buffers (r4e OOM'd lazily rasterizing frame 2 mid-training); the
        # cache stores host numpy, so the raster buffers free immediately
        for _f in range(self.dataset.n_images):
            self._frame_mesh_raster(_f)

    def _init_flat_plan(self):
        """Probe a few training cameras and derive the shared FlatPlan (max
        span / capacity over the probed frames; ops/splat_flat.plan_flat)."""
        from holoscene_tpu.models.gom import gom_opacities, gom_project
        from holoscene_tpu.ops.splat_flat import FlatPlan, plan_flat

        h, w = self.dataset.img_res
        cfg = self.cfg
        tiles_x = -(-w // cfg.tile_size)
        tiles_y = -(-h // cfg.tile_size)
        frames = sorted({0, self.dataset.n_images // 2,
                         self.dataset.n_images - 1})
        host = self._static_host
        proj = jax.jit(lambda sa, p, pose, intr: gom_project(
            p, {**host, **sa}, cfg, pose, intr, w, h))
        opac = gom_opacities(self.params, None)
        best = None
        for f in frames:
            xy, _depth, conic, valid = proj(
                self._static_arr, self.params,
                jnp.asarray(self.dataset.pose_all[f]),
                jnp.asarray(self.dataset.intrinsics[:3, :3]))
            pl = plan_flat(xy, conic, opac, valid, tiles_x, tiles_y,
                           cfg.tile_size, margin=self._flat_margin)
            best = pl if best is None else FlatPlan(
                span_x=max(best.span_x, pl.span_x),
                span_y=max(best.span_y, pl.span_y),
                c_max=max(best.c_max, pl.c_max))
        self.flat_plan_full = best  # eval renders + trim fallback
        self.flat_plan = best
        if not self.quiet:
            print(f"[stage4] flat plan {best} "
                  f"(rebin_every={cfg.rebin_every})")

    def _grow_flat_plan(self):
        """Overflow recovery: re-probe with a larger capacity margin and
        re-jit (the gsplat buffer-realloc analog). Any active trim resets —
        the next _maybe_trim_plan re-derives it from the used caches."""
        self._flat_margin *= 1.5
        self._trim_active = False
        self._init_flat_plan()
        self._bins_cache.clear()
        self._bins_age.clear()
        self._build_jits()

    def _maybe_trim_plan(self):
        """Swap to the saturation-trimmed static plan once every training
        frame has reported walked-chunk counts (GoMConfig.trim_flat; see
        ops/splat_flat.plan_trimmed). One re-jit; per-frame rebins then pass
        the frame's used counts so the gathers stop at saturation depth."""
        if (self._trim_active or not self.use_flat
                or not self.cfg.trim_flat
                or len(self._used_cache) < self.dataset.n_images):
            return
        from holoscene_tpu.ops.splat_flat import FlatPlan, plan_trimmed

        full = self.flat_plan_full
        c_max = 0
        for f, used in self._used_cache.items():
            bins = self._bins_cache.get(f)
            if bins is None:
                return  # frame's bins evicted before trim; wait for revisit
            pl = plan_trimmed(full, bins["tile_chunk_cnt"], used,
                              trim_slack=self.cfg.trim_slack)
            c_max = max(c_max, pl.c_max)
        if c_max >= full.c_max:
            self._trim_active = True  # nothing to gain; don't re-check
            return
        self.flat_plan = FlatPlan(span_x=full.span_x, span_y=full.span_y,
                                  c_max=c_max)
        self._trim_active = True
        self._bins_cache.clear()
        self._bins_age.clear()
        self._build_jits()
        if not self.quiet:
            print(f"[stage4] trim active: c_max {full.c_max} -> {c_max} "
                  f"({100 * c_max / full.c_max:.0f}%)")

    def _refresh_bins(self, frame_idx: int, pose, intr):
        used = (self._used_cache.get(frame_idx)
                if self._trim_active else None)
        bins = self._rebin(self.params, pose, intr, used)
        if int(bins["overflow"]) != 0:
            if not self.quiet:
                print(f"[stage4] flat plan overflow at frame {frame_idx}; "
                      "growing capacity")
            self._grow_flat_plan()
            bins = self._rebin(self.params, pose, intr, None)
        return bins

    def _get_bins(self, frame_idx: int, pose, intr):
        age = self._bins_age.get(frame_idx, 0)
        # adaptive mode (rebin_drift_px > 0): drift readbacks pop stale
        # frames from the cache (run loop), so the periodic cadence is only
        # a long-stop at 8x; cadence mode keeps the fixed period
        period = max(self.cfg.rebin_every, 1) * (
            8 if self.cfg.rebin_drift_px > 0 else 1)
        if frame_idx not in self._bins_cache or age % period == 0:
            self._bins_cache[frame_idx] = self._refresh_bins(
                frame_idx, pose, intr)
            self.rebin_count += 1
        self._bins_age[frame_idx] = age + 1
        return self._bins_cache[frame_idx]

    def _build_jits(self):
        # static gaussian-geometry ARRAYS enter every jit as the `sa`
        # argument (see __init__: closure constants overflow the remote
        # compiler at real mesh scale); host scalars stay closure-bound
        host = self._static_host
        cfg_ = self.cfg
        optimizer = self.optimizer
        loss_scale = self.loss_scale
        flat_plan = self.flat_plan if self.use_flat else None
        h_ds, w_ds = self.dataset.img_res

        if self.use_flat:
            from holoscene_tpu.models.gom import gom_flat_bins

            self._rebin_jit = jax.jit(
                lambda sa, p, pose, intr, used: gom_flat_bins(
                    p, {**host, **sa}, cfg_, pose, intr, w_ds, h_ds,
                    flat_plan, used_chunks=used))
            self._rebin = lambda p, pose, intr, used: self._rebin_jit(
                self._static_arr, p, pose, intr, used)
        else:
            self._rebin = None

        def step_fn(sa, params, opt_state, key, pose, intr, image, acm,
                    mesh_depth, bins):
            """image arrives CHANNELS-MAJOR [3, H, W] (the trainer
            pre-transposes once per frame): the whole render+loss graph
            then runs W-minor, skipping the [*, 3] 128-lane pad (PERF.md
            r4 attribution, ~5-6 ms of the step at 512^2)."""
            static = {**host, **sa}
            h, w = image.shape[1], image.shape[2]
            bg = jax.random.uniform(key, (3,))

            def loss_fn(p):
                out = render_gom(p, static, cfg_, pose, intr, w, h, bg,
                                 flat_plan=flat_plan, flat_bins=bins,
                                 chw=True)
                batch = {
                    "image": image * acm[None] + (1 - acm[None])
                    * bg[:, None, None],
                    "acm": acm,
                    "mesh_depth": mesh_depth,
                    "mask": None,
                }
                losses = gom_loss(
                    out, batch, cfg_,
                    with_scale_reg=cfg_.use_scale_regularization,
                    scales_linear=gom_scales(p, static, cfg_),
                    chw=True,
                )
                total = losses["main_loss"] * loss_scale + losses["scale_reg"]
                psnr = -10.0 * jnp.log10(
                    jnp.mean((out["rgb"] - image) ** 2) + 1e-12
                )
                # flat-path walk diagnostics feed the saturation trim; a
                # silent default here once fed used=0 into the trim caps
                # (truncated renders, diverging training) — require them
                if flat_plan is not None:
                    used = out["used_chunks"]    # [T] int32 walked chunks
                    stale = out["stale"]
                    drift = out.get("xy_drift", jnp.zeros(()))
                else:
                    used = jnp.zeros((), jnp.int32)
                    stale = jnp.zeros((), jnp.int32)
                    drift = jnp.zeros(())
                return total, (losses, psnr, used, stale, drift)

            (total, (losses, psnr, used, stale, drift)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state,
                    {**losses, "loss": total, "psnr": psnr}, used, stale,
                    drift)

        self._step_jit = jax.jit(step_fn, donate_argnums=(1, 2))
        self._step = lambda *a: self._step_jit(self._static_arr, *a)

        n_gauss = self.static["num_gaussians"]

        def invis_step_fn(sa, params, opt_state, key, pose, half_extent,
                          image, mask, visible_mask):
            """Invisible-view supervision: render ONLY one object's gaussians
            from a generated orthographic view (reference get_invis_loss /
            get_bg_loss, holoscene_train_gaussian.py:936/:1069 with
            visible_gs_indices opacity masking, model/gom.py:1004-1011)."""
            static = {**host, **sa}
            h, w = image.shape[0], image.shape[1]
            bg = jax.random.uniform(key, (3,))
            intr = jnp.array(
                [[w / (2 * half_extent), 0.0, w / 2.0],
                 [0.0, h / (2 * half_extent), h / 2.0],
                 [0.0, 0.0, 1.0]]
            )

            def loss_fn(p):
                out = render_gom(p, static, cfg_, pose, intr, w, h, bg,
                                 visible_mask=visible_mask, ortho=True)
                m = mask[..., None]
                gt = image * m + (1 - m) * bg
                l1 = jnp.mean(jnp.abs(out["rgb"] - gt))
                acm = jnp.mean(jnp.abs(out["accumulation"] - mask))
                return l1 + acm, (l1, acm)

            (_, (l1, acm)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l1

        self._invis_step_jit = jax.jit(invis_step_fn, donate_argnums=(1, 2))
        self._invis_step = lambda *a: self._invis_step_jit(
            self._static_arr, *a)

        flat_plan_full = getattr(self, "flat_plan_full", flat_plan)

        def render_eval(sa, params, pose, intr, h: int, w: int):
            bg = jnp.zeros(3)
            # eval renders bin fresh (exact, no staleness) on the flat path
            # — under the FULL plan: a trimmed capacity without per-frame
            # used counts would overflow
            fp = flat_plan_full if (h, w) == (h_ds, w_ds) else None
            return render_gom(params, {**host, **sa}, cfg_, pose, intr,
                              w, h, bg, flat_plan=fp)

        self._render_eval_jit = jax.jit(render_eval, static_argnums=(4, 5))
        self._render_eval = lambda *a: self._render_eval_jit(
            self._static_arr, *a)

    def _frame_mesh_raster(self, frame_idx: int, max_faces: int = 150_000):
        """Cached mesh mask + depth for a training frame
        (reference :550-575, recomputed per-iter there). Meshes above the
        face cap rasterize DECIMATED: the mask/depth priors don't need
        stage-3 texture-resolution geometry, and full-res rasterization of
        a ~500k-face baked scene OOMs the chip next to the training state
        (r4d chain run)."""
        if frame_idx not in self._mesh_cache:
            if not hasattr(self, "_raster_meshes"):
                self._raster_meshes = [
                    m.decimate(max_faces) if len(m.faces) > max_faces else m
                    for m in self.meshes
                ]
            h, w = self.dataset.img_res
            out = rasterize_mesh_list(
                [(m.vertices, m.faces) for m in self._raster_meshes],
                self.dataset.pose_all[frame_idx],
                self.dataset.intrinsics[:3, :3],
                (h, w),
            )
            mask = np.asarray(out["mask"], dtype=np.float32)
            depth = np.asarray(out["depth"], dtype=np.float32)
            depth = np.where(mask > 0, depth, depth[mask > 0].max() if mask.any() else 1.0)
            self._mesh_cache[frame_idx] = (mask, depth)
        return self._mesh_cache[frame_idx]

    def load_vis_info(self, plots_dir: str):
        """Attach Stage-2 generated-view packs (vis_info_{i}.pkl /
        bg_info.pkl) for invisible-view supervision."""
        import pickle

        for i in range(len(self.meshes)):
            name = "bg_info.pkl" if i == 0 else f"vis_info_{i}.pkl"
            p = os.path.join(plots_dir, name)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    self.vis_info_list[i] = pickle.load(f)

    def _visible_mask(self, obj_i: int):
        lo, hi = self.instance_ranges[obj_i]
        n = self.static["num_gaussians"]
        return (jnp.arange(n) >= lo) & (jnp.arange(n) < hi)

    def run(self, n_iters: int | None = None, log_every: int = 20):
        end = self.iter_step + (n_iters or self.max_total_iters - self.iter_step)
        h, w = self.dataset.img_res
        t0 = time.time()
        has_vis = any(len(v) for v in self.vis_info_list)
        pending_stale = None  # (frame_idx, device scalar) — read next iter
        pending_drift = None  # (frame_idx, device scalar), adaptive rebin
        for it in range(self.iter_step, end):
            frame_idx = int(self.rng.integers(0, self.dataset.n_images))
            acm, mesh_depth = self._frame_mesh_raster(frame_idx)
            if frame_idx not in self._chw_cache:
                # channels-major [3,H,W] (step_fn's layout), host-cached
                self._chw_cache[frame_idx] = np.ascontiguousarray(
                    self.dataset.rgb_images[frame_idx]
                    .reshape(h, w, 3).transpose(2, 0, 1))
            image = self._chw_cache[frame_idx]
            self.key, k = jax.random.split(self.key)
            pose = jnp.asarray(self.dataset.pose_all[frame_idx])
            intr = jnp.asarray(self.dataset.intrinsics[:3, :3])
            if pending_stale is not None:
                # one-step-delayed readback: by now the producing step has
                # retired, so int() doesn't stall dispatch of THIS step
                sf, sv = pending_stale
                pending_stale = None
                if int(sv):
                    self.stale_steps += 1
                    # the frame rendered truncated under a trimmed plan:
                    # drop its cached bins so the next visit rebins early
                    self._bins_cache.pop(sf, None)
                    self._bins_age.pop(sf, None)
            if pending_drift is not None:
                df, dv = pending_drift
                pending_drift = None
                if float(dv) > self.cfg.rebin_drift_px:
                    self._bins_cache.pop(df, None)  # rebin on next visit
            bins = (self._get_bins(frame_idx, pose, intr)
                    if self.use_flat else None)
            (self.params, self.opt_state, metrics, used, stale,
             drift) = self._step(
                self.params, self.opt_state, k, pose, intr,
                jnp.asarray(image), jnp.asarray(acm), jnp.asarray(mesh_depth),
                bins,
            )
            if self.use_flat:
                self._used_cache[frame_idx] = used
                if self._trim_active:
                    pending_stale = (frame_idx, stale)
                if self.cfg.rebin_drift_px > 0:
                    pending_drift = (frame_idx, drift)
                self._maybe_trim_plan()
            if has_vis:
                # one random object's generated view per iteration
                # (reference :640-660)
                objs = [i for i, v in enumerate(self.vis_info_list) if v]
                obj_i = int(self.rng.choice(objs))
                pack = self.vis_info_list[obj_i][
                    int(self.rng.integers(len(self.vis_info_list[obj_i])))
                ]
                if "half_extent" in pack and "rgb" in pack:
                    self.key, k = jax.random.split(self.key)
                    self.params, self.opt_state, _ = self._invis_step(
                        self.params, self.opt_state, k,
                        jnp.asarray(pack["pose"], jnp.float32),
                        jnp.asarray(float(pack["half_extent"])),
                        jnp.asarray(pack["rgb"], jnp.float32),
                        jnp.asarray(pack["mask"], jnp.float32),
                        self._visible_mask(obj_i),
                    )
            if it % log_every == 0 or it == end - 1:
                m = {k2: float(v) for k2, v in metrics.items()}
                m["iter"] = it
                m["stale_steps"] = self.stale_steps
                m["rebin_count"] = self.rebin_count
                m["splats_per_sec"] = (
                    self.static["num_gaussians"] * (it - self.iter_step + 1)
                    / max(time.time() - t0, 1e-9)
                )
                self.history.append(m)
                if not self.quiet:
                    print(
                        f"[stage4] it {it} loss={m['loss']:.4f} "
                        f"psnr={m['psnr']:.2f} l1={m['l1']:.4f}"
                    )
        self.iter_step = end
        return self.history

    def eval_split(self, split: str = "test", max_frames: int = 8):
        """PSNR/SSIM/LPIPS over a split (reference eval_test/eval_train,
        :700-860)."""
        src = self.dataset.test if split == "test" else None
        n = (
            len(src["pose_all"])
            if src is not None
            else self.dataset.n_images
        )
        h, w = self.dataset.img_res
        metrics = []
        for i in range(min(n, max_frames)):
            pose = (src["pose_all"] if src else self.dataset.pose_all)[i]
            gt = (src["rgb_images"] if src else self.dataset.rgb_images)[i]
            out = self._render_eval(
                self.params, jnp.asarray(pose),
                jnp.asarray(self.dataset.intrinsics[:3, :3]), h, w,
            )
            pred = np.asarray(out["rgb"])
            metrics.append(eval_rgb(pred, gt.reshape(h, w, 3)))
        return {
            k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]
        }

    def export(self):
        """gauss_obj_{i}.ply/.npz + combined scene (reference exports
        gauss_obj_{i}.pt + .ply, :684-690; npz is the torch-free .pt
        counterpart and reload format for eval/USD export)."""
        paths = []
        for i, (lo, hi) in enumerate(self.instance_ranges):
            g = compose_for_export(
                self.params, self.static, self.cfg, select=slice(lo, hi)
            )
            p = os.path.join(self.out_dir, f"gauss_obj_{i}.ply")
            write_gaussian_ply(p, g)
            np.savez(os.path.join(self.out_dir, f"gauss_obj_{i}.npz"), **g)
            paths.append(p)
        g_all = compose_for_export(self.params, self.static, self.cfg)
        p_all = os.path.join(self.out_dir, "gauss_scene.ply")
        write_gaussian_ply(p_all, g_all)
        # Omniverse/Isaac-consumable USDZ (3dgrut NuRec schema; reference
        # export/export_gs_usd.py -> ply_to_usd.py)
        from holoscene_tpu.export.gs_usdz import export_from_gaussian_dict

        usdz = os.path.join(self.out_dir, "gauss_scene.usdz")
        export_from_gaussian_dict(usdz, g_all, sh_degree=self.cfg.sh_degree)
        return paths + [p_all, usdz]
