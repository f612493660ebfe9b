"""Stage-2 runner: generative per-object refinement + physics validation.

Reference semantics: training/holoscene_train_post.py
(`HoloSceneTrainPostRunner`, 4061 LoC) — the orchestration is:

  run() (:393):
    1. extract + prune instance meshes, per-object bboxes (:405-412)
    2. infer the scene graph from meshes when graph.json is absent (:414)
    3. background: inpaint occluded regions + 500-iter local SDF finetune
       (:446-452)
    4. generative_sampling (:733), per object sorted by distance-to-root:
       a. view-weight analysis over an (azimuth, elevation) grid (:885)
       b. render the object orthographically; inpaint occluder regions
          (LaMa; :1013-1080)
       c. if view coverage is poor: novel views from Wonder3D (+SR, +normal
          re-estimation), with a seed-retry ladder (:1591-1595)
       d. per-object SDF finetune under generated-view + parent-collision
          constraints (:3394)
       e. marching-cubes candidates at several prune thresholds; accept the
          first that passes sim_validation (< 8 deg drift) (:1697-1966),
          falling back to the best unstable candidate (:1972-1978)
       f. export coarse_recon_obj_{i}.ply + vis_info_{i}.pkl (:1981-1989)
    5. solve_intersection -> translation_dict.pkl (:2002)
    6. final whole-scene sim_scene (:2003)

The frozen generative models run behind providers
(holoscene_tpu/stage2/providers.py); physics behind
holoscene_tpu/physics providers.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.holoscene import (
    HoloSceneConfig,
    render_rays_only_multi_obj,
)
from holoscene_tpu.physics import settle_drop, sim_scene, sim_validation
from holoscene_tpu.stage2.providers import default_providers, save_vis_info
from holoscene_tpu.stage2.refine import (
    FinetuneConfig,
    make_object_finetune_step,
    sample_collision_points,
)
from holoscene_tpu.stage2.scene_graph import (
    create_scene_graph_from_meshes,
    solve_intersection,
)
from holoscene_tpu.stage2.views import (
    select_best_views,
    wonder3d_camera_rig,
)
from holoscene_tpu.utils.mesh import Mesh, write_ply
from holoscene_tpu.utils.plots import extract_object_meshes


class Stage2Runner:
    def __init__(
        self,
        params,
        model_cfg: HoloSceneConfig,
        dataset,
        out_dir: str = "stage2_out",
        loss_cfg: LossConfig | None = None,
        finetune_cfg: FinetuneConfig = FinetuneConfig(),
        providers: dict | None = None,
        mesh_resolution: int = 128,
        view_render_res: int = 64,
        coverage_threshold: float = 0.55,
        stability_threshold_deg: float = 8.0,
        candidate_levels: tuple[float, ...] = (0.0, 0.003, 0.006),
        seeds: tuple[int, ...] = (42, 43, 44),
        seed: int = 0,
        quiet: bool = False,
        view_mesh_cap: int = 200_000,
    ):
        self.params = params
        self.cfg = model_cfg
        self.dataset = dataset
        self.out_dir = out_dir
        self.lcfg = loss_cfg or LossConfig()
        self.fcfg = finetune_cfg
        self.mesh_resolution = mesh_resolution
        self.view_render_res = view_render_res
        self.coverage_threshold = coverage_threshold
        self.stability_threshold = stability_threshold_deg
        self.candidate_levels = candidate_levels
        self.seeds = seeds
        self.quiet = quiet
        # face cap for the VIEW machinery only (view selection, visibility
        # integration, occlusion masks, stability sims) — pixel-level
        # silhouettes at view_render_res don't need res>=256 MC meshes, and
        # rasterizing multi-M-face scenes ~200x per object made the runner
        # silently slow at flagship scale. Final geometry is never capped.
        self.view_mesh_cap = view_mesh_cap
        self._view_mesh_cache: dict[int, Mesh] = {}
        os.makedirs(out_dir, exist_ok=True)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.failed_object_list: list[int] = []

        from holoscene_tpu.models.fields import (
            implicit_sdf_raw,
            implicit_shift_sdf_raw,
        )

        self._sdf_raw = jax.jit(
            lambda p, pts: implicit_sdf_raw(p, self.cfg.implicit, pts)
        )
        # disentangled selector for mesh extraction (reference
        # get_shift_sdf_raw via utils/plots.py:154,:240): other objects'
        # interiors cannot leak into an object's extracted surface
        self._shift_sdf_raw = jax.jit(
            lambda p, pts: implicit_shift_sdf_raw(p, self.cfg.implicit, pts)
        )
        self.providers = providers or default_providers(
            render_fn=self._render_view_pack_factory()
        )
        self._current_obj: int | None = None

    # ------------------------------------------------------------------
    # rendering helpers
    # ------------------------------------------------------------------

    def _view_mesh(self, m: Mesh | None) -> Mesh | None:
        """Decimated stand-in (<= view_mesh_cap faces) for view-selection /
        visibility / occlusion / simulation queries; cached per source mesh.
        The cache holds the source too, so a recycled id() cannot alias."""
        if m is None or len(m.faces) <= self.view_mesh_cap:
            return m
        hit = self._view_mesh_cache.get(id(m))
        if hit is None or hit[0] is not m:
            hit = (m, m.decimate(self.view_mesh_cap))
            self._view_mesh_cache[id(m)] = hit
        return hit[1]

    def _ortho_uv(self, res: int):
        ys, xs = np.mgrid[0:res, 0:res]
        uv = np.stack(
            [(xs + 0.5) / res * 2 - 1, (ys + 0.5) / res * 2 - 1], axis=-1
        ).reshape(-1, 2)
        return jnp.asarray(uv, dtype=jnp.float32)

    def render_object_view(self, obj_i: int, pose: np.ndarray,
                           half_extent: float, res: int | None = None,
                           chunk: int = 4096) -> dict:
        """Isolated orthographic render of one object (reference
        forward_only_multi_obj_rays over 1024-ray chunks,
        holoscene_train_post.py:973)."""
        res = res or self.view_render_res
        uv = self._ortho_uv(res)
        pose_j = jnp.asarray(pose, dtype=jnp.float32)
        rays_o = pose_j[:3, 3][None, :] + (
            uv[:, 0:1] * half_extent * pose_j[:3, 0][None, :]
            + uv[:, 1:2] * half_extent * pose_j[:3, 1][None, :]
        )
        rays_d = jnp.broadcast_to(pose_j[:3, 2][None, :], rays_o.shape)
        outs = {"rgb": [], "normal": [], "depth": [], "acc": []}
        for i in range(0, rays_o.shape[0], chunk):
            out = render_rays_only_multi_obj(
                self.params, self.cfg, jax.random.PRNGKey(0),
                rays_o[i : i + chunk], rays_d[i : i + chunk],
                jnp.ones((min(chunk, rays_o.shape[0] - i), 1)),
                pose_j[:3, :3].T, (obj_i,), training=False,
            )
            outs["rgb"].append(np.asarray(out["rgb_values"]))
            outs["normal"].append(np.asarray(out["normal_map"]))
            outs["depth"].append(np.asarray(out["depth_values"]))
            outs["acc"].append(np.asarray(out["acc"]))
        return {
            "rgb": np.concatenate(outs["rgb"]).reshape(res, res, 3),
            "normal": np.concatenate(outs["normal"]).reshape(res, res, 3),
            "depth": np.concatenate(outs["depth"]).reshape(res, res),
            "mask": np.concatenate(outs["acc"]).reshape(res, res) > 0.5,
        }

    def _render_view_pack_factory(self):
        def render_fn(pose, seed):
            obj_i = self._current_obj if self._current_obj is not None else 0
            half = self._current_half_extent
            pack = self.render_object_view(obj_i, pose, half)
            return {"rgb": pack["rgb"], "normal": pack["normal"],
                    "mask": pack["mask"]}

        return render_fn

    # ------------------------------------------------------------------
    # pipeline steps
    # ------------------------------------------------------------------

    def extract_meshes(self) -> list[Mesh | None]:
        params = self.params["implicit"]
        meshes = extract_object_meshes(
            lambda pts: self._shift_sdf_raw(params, pts),
            self.cfg.implicit.d_out,
            resolution=self.mesh_resolution,
        )
        # the disentangled selector can empty an object whose region is not
        # yet won on an undertrained model — fall back to its plain SDF,
        # re-extracting only the missing objects (fine extraction is the
        # stage's most expensive step)
        missing = {i for i, m in enumerate(meshes) if m is None}
        if missing:
            plain = extract_object_meshes(
                lambda pts: self._sdf_raw(params, pts),
                self.cfg.implicit.d_out,
                resolution=self.mesh_resolution,
                only=missing,
            )
            meshes = [m if m is not None else p
                      for m, p in zip(meshes, plain)]
        return meshes

    def object_mesh_candidates(self, obj_i: int) -> list[Mesh]:
        """Marching-cubes candidates at multiple prune thresholds
        (marching_cubes_from_sdf_center_scale_rm_intersect,
        utils/general.py:3687)."""
        params = self.params["implicit"]
        from holoscene_tpu.utils.mc import extract_mesh

        # candidates stay RAW (floaters included): stability_ladder tests
        # the raw mesh first and applies largest_component as a *rescue*
        # re-test on failure (reference clean_mesh_floaters_adjust,
        # holoscene_train_post.py:1835-1850) — pre-cleaning here would make
        # that rescue unreachable
        candidates = []
        for level in self.candidate_levels:
            v, f = extract_mesh(
                lambda pts: self._shift_sdf_raw(params, pts)[:, obj_i],
                resolution=self.mesh_resolution,
                level=level,
            )
            if len(f):
                candidates.append(Mesh(v, f))
        if not candidates:
            # undertrained models: the disentangled selector can empty an
            # object whose region is not yet won — plain-SDF fallback
            for level in self.candidate_levels:
                v, f = extract_mesh(
                    lambda pts: self._sdf_raw(params, pts)[:, obj_i],
                    resolution=self.mesh_resolution,
                    level=level,
                )
                if len(f):
                    candidates.append(Mesh(v, f))
        return candidates

    def stability_ladder(self, obj_i: int, support_meshes: list[Mesh],
                         extra_candidates: list[Mesh] = ()):
        """Try candidates until one passes sim_validation (< 8 deg)
        (holoscene_train_post.py:1697-1978). An unstable candidate gets a
        floater-cleanup re-test (reference clean_mesh_floaters_adjust +
        re-validation, :1835-1850): small disconnected components shift the
        COM and support polygon — dropping them can rescue a good mesh."""
        best = None
        best_drift = np.inf
        supports_v = [self._view_mesh(s) for s in support_meshes]
        # geometric sanity gate BEFORE physics: a candidate far outside the
        # normalized scene volume is corrupt regardless of its sim drift
        # (an unclamped coarse_recon once emitted a ±5000-unit mesh the
        # drift test happily "accepted"; see remesh.py trust region)
        sane_r = 3.0 * float(getattr(
            self.cfg, "scene_bounding_sphere", 1.0))

        def _sane(c):
            v = np.asarray(c.vertices)
            ok = len(v) > 0 and np.isfinite(v).all() and \
                float(np.abs(v).max()) <= sane_r
            if not ok and not self.quiet:
                print(f"  [obj {obj_i}] candidate REJECTED by sanity gate "
                      f"(extent {float(np.abs(v).max()) if len(v) else 0:.1f}"
                      f" > {sane_r:.1f})", flush=True)
            return ok

        for cand in filter(_sane, [*self.object_mesh_candidates(obj_i),
                                   *extra_candidates]):
            res = sim_validation([*supports_v, self._view_mesh(cand)])
            if not self.quiet:
                print(f"  [obj {obj_i}] candidate drift={res.drift_deg:.1f}deg",
                      flush=True)
            if res.drift_deg < best_drift:
                best, best_drift = cand, res.drift_deg
            if res.drift_deg < self.stability_threshold:
                # ship floater-free when cleanup keeps the mesh stable
                cleaned = cand.largest_component()
                if len(cleaned.faces) < len(cand.faces):
                    res_c = sim_validation(
                        [*supports_v, self._view_mesh(cleaned)])
                    if res_c.drift_deg < self.stability_threshold:
                        return cleaned, res_c.drift_deg, True
                return cand, res.drift_deg, True
            cleaned = cand.largest_component()
            if len(cleaned.faces) < len(cand.faces):
                res2 = sim_validation([*supports_v, self._view_mesh(cleaned)])
                if not self.quiet:
                    print(f"  [obj {obj_i}] floater-cleaned re-test "
                          f"drift={res2.drift_deg:.1f}deg", flush=True)
                if res2.drift_deg < best_drift:
                    best, best_drift = cleaned, res2.drift_deg
                if res2.drift_deg < self.stability_threshold:
                    return cleaned, res2.drift_deg, True
        if best is None:
            self.failed_object_list.append(obj_i)
        return best, best_drift, False

    def generate_novel_views(self, obj_i: int, mesh: Mesh,
                             half_extent: float) -> list[dict]:
        """Novel views from the provider with the Wonder3D rig + seed-retry
        (holoscene_train_post.py:1591-1595). Returns vis_info-style packs."""
        b = mesh.bounds
        center = (b[0] + b[1]) / 2
        radius = float(np.linalg.norm(b[1] - b[0])) * 1.2
        rig = wonder3d_camera_rig(center, radius)
        front = self.render_object_view(obj_i, rig[0], half_extent)

        provider = self.providers.get("novel_view")
        self._current_obj = obj_i
        self._current_half_extent = half_extent
        views = None
        for seed in self.seeds:
            try:
                views = provider.generate_views(
                    front["rgb"], front["mask"], rig, seed=seed, obj_i=obj_i
                )
                break
            except Exception as e:  # retry ladder
                if not self.quiet:
                    print(f"  [obj {obj_i}] novel-view seed {seed} failed: {e}")
        if views is None:
            return []
        packs = []
        for vi, (pose, v) in enumerate(zip(rig, views)):
            pack = {
                # recorded packs (CachedArtifactNovelViewProvider) carry
                # their own camera; live providers inherit the rig pose
                "pose": np.asarray(v.get("pose", pose), dtype=np.float32),
                "half_extent": float(v.get("half_extent", half_extent)),
                "rgb": np.asarray(v["rgb"], dtype=np.float32),
                "normal": np.asarray(v["normal"], dtype=np.float32),
                "mask": np.asarray(v["mask"], dtype=bool),
                # rig[0] is the observed FRONT view — its silhouette is
                # trusted 25x (reference lambda_mask boost, :566)
                "front": bool(v.get("front", vi == 0)),
            }
            if v.get("depth") is not None:  # recorded packs may carry depth
                pack["depth"] = np.asarray(v["depth"], dtype=np.float32)
                pack["depth_mask"] = np.asarray(
                    v.get("depth_mask", v["mask"]), dtype=bool
                )
            packs.append(pack)
        return packs

    def object_view_packs(
        self,
        obj_i: int,
        meshes: list[Mesh | None],
        best_views: list[tuple[np.ndarray, float]],
        half_extent: float,
    ) -> list[dict]:
        """Render the object from its best views, inpaint the regions
        occluded by other scene objects, and gate by depth->normal
        consistency — the reference's core recover-the-unseen step
        (holoscene_train_post.py:1013-1112). Returns vis_info-style packs
        consumed by invisible_view_loss (with per-channel masks)."""
        from holoscene_tpu.stage2.inpaint_views import (
            inpaint_object_view,
            occluded_region,
        )

        inpaint = self.providers.get("inpaint")
        obj_mesh = self._view_mesh(meshes[obj_i])
        occluders = [
            self._view_mesh(m)
            for j, m in enumerate(meshes) if j != obj_i and m is not None
        ]
        packs = []
        for pose, weight in best_views:
            view = self.render_object_view(obj_i, pose, half_extent)
            occ, self_vis = occluded_region(
                obj_mesh, occluders, pose, half_extent,
                self.view_render_res,
            )
            if occ.sum() == 0 or inpaint is None:
                gated = {
                    "rgb": view["rgb"], "normal": view["normal"],
                    "depth": view["depth"], "mask": view["mask"],
                    "nm_mask": view["mask"], "depth_mask": view["mask"],
                    "sm_mask": occ, "deviated": False,
                }
            else:
                gated = inpaint_object_view(
                    view, occ, self_vis, inpaint, half_extent
                )
            packs.append(
                {
                    "pose": np.asarray(pose, dtype=np.float32),
                    "half_extent": float(half_extent),
                    "rgb": gated["rgb"].astype(np.float32),
                    "normal": gated["normal"].astype(np.float32),
                    "depth": gated["depth"].astype(np.float32),
                    "mask": gated["mask"].astype(bool),
                    "nm_mask": gated["nm_mask"].astype(bool),
                    "depth_mask": gated["depth_mask"].astype(bool),
                    "sm_mask": gated["sm_mask"].astype(bool),
                    "weight": float(weight),
                    "deviated": bool(gated.get("deviated", False)),
                    "source": "inpaint",
                }
            )
            if not self.quiet and occ.sum() > 0:
                print(
                    f"  [obj {obj_i}] inpainted view: {int(occ.sum())} px "
                    f"occluded, deviated={gated.get('deviated', False)}", flush=True
                )
        return packs

    def background_packs(self, max_views: int = 4) -> list[dict]:
        """Inpaint background regions occluded by foreground objects in
        training views (background_inpainting_sampling,
        holoscene_train_post.py:2703 + LaMa passes :1013-1080) ->
        bg_info-style supervision packs over PERSPECTIVE training views.
        """
        inpaint = self.providers.get("inpaint")
        h, w = self.dataset.img_res
        packs = []
        n = min(max_views, self.dataset.n_images)
        frame_ids = np.linspace(0, self.dataset.n_images - 1, n).astype(int)
        for fi in frame_ids:
            sem = self.dataset.semantic_images[fi].reshape(h, w)
            occluded = sem != 0
            if occluded.mean() < 0.01:
                continue
            rgb = self.dataset.rgb_images[fi].reshape(h, w, 3)
            normal = self.dataset.normal_images[fi].reshape(h, w, 3)
            depth = self.dataset.depth_images[fi].reshape(h, w)
            # occlusion CLUSTERING (reference background_inpainting_sampling,
            # holoscene_train_post.py:2703): inpaint each connected occluded
            # region separately so every fill sees only its local context;
            # specks below 0.2% of the frame are skipped
            from scipy import ndimage

            labels, n_comp = ndimage.label(occluded)
            rgb_in, normal_in = rgb.copy(), normal.copy()
            depth_in = depth.copy()
            filled = np.zeros_like(occluded)
            for ci in range(1, n_comp + 1):
                cluster = labels == ci
                if cluster.mean() < 0.002:
                    continue
                rgb_in = np.where(
                    cluster[..., None], inpaint.inpaint(rgb, cluster), rgb_in
                )
                normal_in = np.where(
                    cluster[..., None], inpaint.inpaint(normal, cluster),
                    normal_in,
                )
                depth_in = np.where(
                    cluster,
                    inpaint.inpaint(depth[..., None], cluster)[..., 0],
                    depth_in,
                )
                filled |= cluster
            occluded = filled
            if occluded.mean() < 0.01:
                continue
            packs.append(
                {
                    "frame": int(fi),
                    "pose": self.dataset.pose_all[fi],
                    "rgb": rgb_in.astype(np.float32),
                    "normal": normal_in.astype(np.float32),
                    "depth": depth_in.astype(np.float32),
                    # supervise exactly the regions that WERE occluded
                    "mask": occluded,
                }
            )
        return packs

    def background_reconstruction(self, n_iters: int | None = None,
                                  bg_packs: list[dict] | None = None):
        """Finetune object 0 under inpainted-background supervision
        (background_reconstruction, holoscene_train_post.py:3245)."""
        if bg_packs is None:
            bg_packs = self.background_packs()
        if bg_packs:
            save_vis_info(os.path.join(self.out_dir, "bg_info.pkl"), bg_packs)

        # inpainted-bg supervision uses the post conf's bg_nm_l1/bg_nm_cos
        # (and optional bg_depth) weights — 25x the stage-1 normal weights
        # in the reference confs (calculate_background_recon_loss :668-671)
        bg_lcfg = self.lcfg
        bg_set = (self.fcfg.bg_nm_l1, self.fcfg.bg_nm_cos, self.fcfg.bg_depth)
        if bg_packs and any(v is not None for v in bg_set):
            import dataclasses as _dc

            bg_lcfg = _dc.replace(
                self.lcfg,
                normal_l1_weight=(
                    self.fcfg.bg_nm_l1 if self.fcfg.bg_nm_l1 is not None
                    else self.lcfg.normal_l1_weight
                ),
                normal_cos_weight=(
                    self.fcfg.bg_nm_cos if self.fcfg.bg_nm_cos is not None
                    else self.lcfg.normal_cos_weight
                ),
                depth_weight=(
                    self.fcfg.bg_depth if self.fcfg.bg_depth is not None
                    else self.lcfg.depth_weight
                ),
            )
        step, optimizer = make_object_finetune_step(
            self.cfg, bg_lcfg, self.fcfg, 0
        )
        opt_state = optimizer.init(self.params)
        total = n_iters or self.fcfg.iters
        m = self.fcfg.rays_per_step
        for it in range(total):
            if bg_packs:
                # sample inpainted-bg pixels as the ray batch: rays from the
                # training camera supervised by the inpainted rgb/normal/depth
                pack = bg_packs[int(self.rng.integers(len(bg_packs)))]
                hh, ww = pack["mask"].shape
                cand = np.flatnonzero(pack["mask"].reshape(-1))
                if len(cand) == 0:
                    continue
                pix = self.rng.choice(cand, m)
                uv = np.stack([pix % ww, pix // ww], -1).astype(np.float32)
                batch = {
                    "uv": jnp.asarray(uv),
                    "pose": jnp.asarray(pack["pose"]),
                    "intrinsics": jnp.asarray(self.dataset.intrinsics),
                    "rgb": jnp.asarray(pack["rgb"].reshape(-1, 3)[pix]),
                    "depth": jnp.asarray(
                        pack["depth"].reshape(-1, 1)[pix]
                    ),
                    "normal": jnp.asarray(pack["normal"].reshape(-1, 3)[pix]),
                    "segs": jnp.zeros(m, dtype=jnp.int32),
                    "mask": jnp.ones((m, 1)),
                }
            else:
                _, sample, gt = self.dataset.sample_rays(m, class_id=0)
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
            zero = jnp.zeros((self.fcfg.invis_pixels, 3))
            gen_view = {
                "pose": jnp.eye(4), "half_extent": jnp.asarray(1.0),
                "rgb": zero, "normal": zero,
                "mask": jnp.zeros(self.fcfg.invis_pixels),
                "nm_mask": jnp.zeros(self.fcfg.invis_pixels),
                "uv": jnp.zeros((self.fcfg.invis_pixels, 2)),
            }
            coll_pts = jnp.zeros((self.fcfg.collision_pts, 3))
            coll_sdf = jnp.full((self.fcfg.collision_pts,), 1e3)
            self.key, k = jax.random.split(self.key)
            self.params, opt_state, metrics = step(
                self.params, opt_state, k, batch, gen_view, jnp.asarray(0.0),
                coll_pts, coll_sdf, use_invis=False, coll_mode="contain",
            )
            if not self.quiet and (it % 50 == 0 or it == total - 1):
                print(f"  [bg] it {it} loss={float(metrics['loss']):.4f}", flush=True)
        return self.params

    def finetune_object(self, obj_i: int, gen_views: list[dict],
                        bbox_center, bbox_scale, parent_ids: tuple[int, ...],
                        n_iters: int | None = None):
        """Refine one object's SDF (holoscene_train_post.py:3394)."""
        step, optimizer = make_object_finetune_step(
            self.cfg, self.lcfg, self.fcfg, obj_i
        )
        opt_state = optimizer.init(self.params)
        total = n_iters or self.fcfg.iters
        m = self.fcfg.invis_pixels

        for it in range(total):
            _, sample, gt = self.dataset.sample_rays(
                self.fcfg.rays_per_step, class_id=obj_i
            )
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
            use_invis = len(gen_views) > 0
            if use_invis:
                view = gen_views[int(self.rng.integers(len(gen_views)))]
                res = view["rgb"].shape[0]
                pix = self.rng.integers(0, res * res, m)
                uv_unit = np.stack(
                    [(pix % res + 0.5) / res * 2 - 1,
                     (pix // res + 0.5) / res * 2 - 1], axis=-1
                )
                nm_mask = view.get("nm_mask", view["mask"])
                # sm_mask marks the LaMa-inpainted region; the finetune step
                # weights those pixels with the conf's lambda_lama_* terms
                # (reference invis_loss{} section)
                inp_mask = view.get("sm_mask", np.zeros_like(view["mask"]))
                # depth supervision only where the view provides it (lambda
                # _depth, reference :589/:621); provider packs without depth
                # get a zeroed mask -> the term vanishes
                depth = view.get("depth")
                dmask = (view.get("depth_mask", view["mask"])
                         if depth is not None
                         else np.zeros_like(view["mask"]))
                if depth is None:
                    depth = np.zeros_like(np.asarray(view["mask"]), np.float32)
                gen_view = {
                    "pose": jnp.asarray(view["pose"]),
                    "half_extent": jnp.asarray(view["half_extent"]),
                    "rgb": jnp.asarray(view["rgb"].reshape(-1, 3)[pix]),
                    "normal": jnp.asarray(view["normal"].reshape(-1, 3)[pix]),
                    "mask": jnp.asarray(
                        view["mask"].reshape(-1)[pix], dtype=jnp.float32
                    ),
                    "nm_mask": jnp.asarray(
                        np.asarray(nm_mask).reshape(-1)[pix],
                        dtype=jnp.float32,
                    ),
                    "inp_mask": jnp.asarray(
                        np.asarray(inp_mask).reshape(-1)[pix],
                        dtype=jnp.float32,
                    ),
                    "depth": jnp.asarray(
                        np.asarray(depth, np.float32).reshape(-1)[pix]
                    ),
                    "depth_mask": jnp.asarray(
                        np.asarray(dmask).reshape(-1)[pix], dtype=jnp.float32
                    ),
                    "uv": jnp.asarray(uv_unit, dtype=jnp.float32),
                    # observed front views carry a 25x-trusted silhouette
                    # (reference lambda_mask boost, holoscene_train_post
                    # .py:566)
                    "mask_boost": jnp.asarray(
                        25.0 if view.get("front") else 1.0
                    ),
                }
            else:
                zero = jnp.zeros((m, 3))
                gen_view = {
                    "pose": jnp.eye(4), "half_extent": jnp.asarray(1.0),
                    "rgb": zero, "normal": zero, "mask": jnp.zeros(m),
                    "nm_mask": jnp.zeros(m), "inp_mask": jnp.zeros(m),
                    "depth": jnp.zeros(m), "depth_mask": jnp.zeros(m),
                    "uv": jnp.zeros((m, 2)), "mask_boost": jnp.asarray(1.0),
                }
            coll_pts, coll_sdf = sample_collision_points(
                self.params, self.cfg, bbox_center, bbox_scale, parent_ids,
                self.fcfg.collision_pts, self.rng,
            )
            self.key, k = jax.random.split(self.key)
            self.params, opt_state, metrics = step(
                self.params, opt_state, k, batch, gen_view,
                jnp.asarray(1.0), coll_pts, coll_sdf,
                use_invis=use_invis, coll_mode="contain",
            )
            if not self.quiet and (it % 50 == 0 or it == total - 1):
                print(
                    f"  [obj {obj_i}] ft it {it} loss={float(metrics['loss']):.4f} "
                    f"coll={float(metrics['collision_loss']):.4f}", flush=True
                )
        return self.params

    # ------------------------------------------------------------------
    # orchestration
    # ------------------------------------------------------------------

    def run(self, finetune_iters: int | None = None):
        if not self.quiet:
            print(f"[stage2] extracting meshes at res {self.mesh_resolution}",
                  flush=True)
        meshes = self.extract_meshes()
        k = self.cfg.implicit.d_out

        graph = (
            self.dataset.graph_node_dict
            if getattr(self.dataset, "graph_node_dict", None)
            else create_scene_graph_from_meshes(meshes)
        )
        with open(os.path.join(self.out_dir, "graph_node_dict.pkl"), "wb") as f:
            pickle.dump(graph, f)

        # background first (holoscene_train_post.py:446-452)
        self.background_reconstruction(n_iters=finetune_iters)

        order = sorted(
            (i for i in range(1, k) if meshes[i] is not None),
            key=lambda i: graph.get(i, {}).get("dist_to_root", 1),
        )
        accepted: dict[int, Mesh] = {}
        if meshes[0] is not None:
            accepted[0] = meshes[0]
            write_ply(
                os.path.join(self.out_dir, "coarse_recon_obj_0.ply"), meshes[0]
            )

        for obj_i in order:
            mesh = meshes[obj_i]
            b = mesh.bounds
            center = (b[0] + b[1]) / 2
            scale = (b[1] - b[0]) / 2 + 0.05
            half_extent = float(np.linalg.norm(b[1] - b[0]) / 2 * 1.3)
            self._current_obj = obj_i
            self._current_half_extent = half_extent

            others = [m for j, m in enumerate(meshes) if j != obj_i and m is not None]
            if not self.quiet:
                print(f"[obj {obj_i}] selecting views "
                      f"({len(mesh.faces)} faces)", flush=True)
            mesh_v = self._view_mesh(mesh)
            others_v = [self._view_mesh(m) for m in others]
            best_views = select_best_views(
                mesh_v, others_v, n_views=4, img_res=self.view_render_res
            )
            # coverage = training-view visibility integrated over the full
            # (azimuth, phi-limited) direction grid (reference weight-map
            # integration, holoscene_train_post.py:2023-2413) — not a max
            # over candidate views
            from holoscene_tpu.stage2.views import (
                integrated_view_coverage,
                training_view_vertex_visibility,
            )

            n_frames = min(8, self.dataset.n_images)
            frame_ids = np.linspace(
                0, self.dataset.n_images - 1, n_frames
            ).astype(int)
            vis = training_view_vertex_visibility(
                mesh_v, others_v,
                [self.dataset.pose_all[f] for f in frame_ids],
                self.dataset.intrinsics[:3, :3],
                tuple(self.dataset.img_res),
            )
            coverage, _ = integrated_view_coverage(mesh_v, vis)
            if not self.quiet:
                print(f"[obj {obj_i}] view coverage {coverage:.2f}",
                      flush=True)

            # occluder-inpainted + consistency-gated object views supervise
            # the finetune ALWAYS (reference lama pass :1013-1112); Wonder3D
            # hallucination is added only when view coverage is poor
            if not self.quiet:
                print(f"[obj {obj_i}] rendering+inpainting object views",
                      flush=True)
            gen_views = self.object_view_packs(
                obj_i, meshes, best_views, half_extent
            )
            if coverage < self.coverage_threshold and self.providers.get("novel_view"):
                gen_views = gen_views + self.generate_novel_views(
                    obj_i, mesh, half_extent
                )

            parent = graph.get(obj_i, {}).get("parent", 0)
            parent_ids = (parent if parent >= 0 else 0,)
            self.finetune_object(
                obj_i, gen_views, center, scale, parent_ids,
                n_iters=finetune_iters,
            )

            # mesh-from-generated-views fallback candidate (reference
            # coarse_recon after Wonder3D, holoscene_train_post.py:1680) —
            # only hallucinated views feed it, not the inpainted renders
            extra = []
            w3d_views = [v for v in gen_views if v.get("source") != "inpaint"]
            if w3d_views:
                try:
                    from holoscene_tpu.stage2.remesh import (
                        CoarseReconConfig,
                        coarse_recon,
                    )

                    extra.append(
                        coarse_recon(
                            w3d_views, center,
                            float(np.linalg.norm(b[1] - b[0]) / 2),
                            CoarseReconConfig(iters=120, img_res=64),
                        )
                    )
                except Exception as e:
                    if not self.quiet:
                        print(f"  [obj {obj_i}] coarse_recon failed: {e}")

            supports = [accepted.get(parent if parent >= 0 else 0)]
            supports = [s for s in supports if s is not None]
            cand, drift, stable = self.stability_ladder(
                obj_i, supports or [mesh], extra_candidates=extra
            )
            if cand is None:
                # zero candidates at all (MC thresholds empty + recon
                # threw): ship the pre-refinement stage-1 mesh rather than
                # hole the scene — downstream stages texture/splat it and
                # the failed flag records the degradation (r4 chain dropped
                # obj 1 here and stage 4 trained a 2-object scene)
                cand = mesh
                if not self.quiet:
                    print(f"  [obj {obj_i}] ladder empty — falling back to "
                          f"the stage-1 mesh", flush=True)
            accepted[obj_i] = cand
            write_ply(
                os.path.join(self.out_dir, f"coarse_recon_obj_{obj_i}.ply"),
                cand,
            )
            if gen_views:
                save_vis_info(
                    os.path.join(self.out_dir, f"vis_info_{obj_i}.pkl"),
                    gen_views,
                )
            if not self.quiet:
                print(f"[obj {obj_i}] accepted drift={drift:.1f} stable={stable}", flush=True)

        mesh_list = [accepted.get(i) for i in range(k)]
        translations = solve_intersection(mesh_list, graph)
        translations, settle_report = self.scene_settle(mesh_list, translations)
        with open(os.path.join(self.out_dir, "translation_dict.pkl"), "wb") as f:
            pickle.dump({i: np.asarray(t) for i, t in translations.items()}, f)

        return {
            "meshes": mesh_list,
            "graph": graph,
            "translations": translations,
            "scene_settle": settle_report,
            "failed_objects": self.failed_object_list,
        }

    def scene_settle(
        self,
        mesh_list: list[Mesh | None],
        translations: dict[int, np.ndarray],
        max_rounds: int = 3,
        verify_uncapped: bool = True,
    ):
        """Final whole-scene physics settle (reference step 6:
        holoscene_train_post.py:2003 calling utils/sim.py:638 sim_scene).

        The composed scene — every accepted mesh at its intersection-resolved
        translation — is re-simulated as a whole; objects that drift or tip
        get their translation updated (quasi-static drop to first contact,
        falling back to the simulator's own settle translation) and the scene
        is re-validated, up to `max_rounds`. The post-translation
        configuration is therefore physically validated, not just
        intersection-free. Writes `scene_settle.json` and returns the final
        translations + the per-round report.

        verify_uncapped (default on): the settle loop simulates decimated
        stand-ins (<= view_mesh_cap faces) for speed, but contact/support
        geometry of a decimated hull can differ near the stability
        threshold — so the FINAL configuration is re-simulated once on the
        UNCAPPED meshes and the report records whether stability and drift
        agree (`uncapped_check` / `uncapped_agrees`). One full-resolution
        sim at the end bounds the decimation error instead of trusting it."""
        import json

        translations = {i: np.asarray(t, np.float64) for i, t in translations.items()}
        idxs = [i for i, m in enumerate(mesh_list) if m is not None]
        report: dict = {"rounds": [], "stable": True}
        if len(idxs) < 2:
            report["note"] = "fewer than two meshes; nothing to settle"
            with open(os.path.join(self.out_dir, "scene_settle.json"), "w") as f:
                json.dump(report, f, indent=1)
            return translations, report

        def composed(i):
            # simulate on the capped stand-ins; translations transfer to the
            # full meshes unchanged
            return self._view_mesh(mesh_list[i]).apply_translation(
                translations.get(i, np.zeros(3)))

        move_eps = 0.01  # settle translation below this = already at rest
        for rnd in range(max_rounds):
            scene = [composed(i) for i in idxs]
            results = sim_scene(scene)  # validates scene[1:] each vs others
            row = []
            needs_settle = []
            for pos, res in enumerate(results, start=1):
                obj_i = idxs[pos]
                moved = float(np.linalg.norm(res.translation)) > move_eps
                row.append(
                    {
                        "obj": int(obj_i),
                        "drift_deg": float(res.drift_deg),
                        "stable": bool(res.stable),
                        "moved": bool(moved),
                        "translation": np.asarray(res.translation, np.float64)
                        .round(6)
                        .tolist(),
                    }
                )
                # a floating object settles by TRANSLATION with near-zero
                # orientation drift — "stable" by the reference's drift<8°
                # test but not at rest; the scene settle must move it
                if not res.stable or moved:
                    needs_settle.append((obj_i, res))
            report["rounds"].append(row)
            if not needs_settle:
                report["stable"] = True
                break
            report["stable"] = False
            for obj_i, res in needs_settle:
                if res.stable:
                    # simulator settled it by translation: adopt that pose —
                    # clamped: a near-free-fall translation (object found no
                    # contact all sim long, e.g. a hole in the recon floor)
                    # must not teleport the object out of the scene (the r4a
                    # chain adopted a 4.9-unit drop unclamped)
                    delta = np.asarray(res.translation, np.float64)
                    nrm = float(np.linalg.norm(delta))
                    if nrm > 0.5:
                        delta = delta * (0.5 / nrm)
                        report.setdefault("clamped", []).append(
                            {"obj": int(obj_i), "raw_norm": round(nrm, 3)})
                else:
                    supports = [composed(j) for j in idxs if j != obj_i]
                    delta = settle_drop(composed(obj_i), supports)
                    if float(np.linalg.norm(delta)) < 1e-6:
                        # no support found below: fall back to where the
                        # simulator itself left the object
                        delta = np.clip(np.asarray(res.translation), -0.2, 0.2)
                translations[obj_i] = translations.get(obj_i, np.zeros(3)) + delta
            if not self.quiet:
                print(
                    f"[scene_settle] round {rnd}: re-settled "
                    f"{[int(i) for i, _ in needs_settle]}"
                )

        if verify_uncapped:
            # one full-resolution re-sim of the FINAL configuration: bounds
            # the decimated-stand-in error (VERDICT r3 #8) instead of
            # assuming translations transfer across the face cap
            scene_full = [
                mesh_list[i].apply_translation(
                    translations.get(i, np.zeros(3)))
                for i in idxs
            ]
            results_full = sim_scene(scene_full)
            check = []
            agrees = True
            capped_last = {r["obj"]: r for r in report["rounds"][-1]}
            for pos, res in enumerate(results_full, start=1):
                obj_i = idxs[pos]
                moved = float(np.linalg.norm(res.translation)) > move_eps
                row = {
                    "obj": int(obj_i),
                    "drift_deg": float(res.drift_deg),
                    "stable": bool(res.stable),
                    "moved": bool(moved),
                }
                capped = capped_last.get(obj_i)
                if capped is not None:
                    row["drift_delta_deg"] = float(
                        abs(res.drift_deg - capped["drift_deg"]))
                    if bool(res.stable) != bool(capped["stable"]):
                        agrees = False
                if not res.stable or moved:
                    agrees = False
                check.append(row)
            report["uncapped_check"] = check
            report["uncapped_agrees"] = bool(agrees)
            if not agrees and not self.quiet:
                print("[scene_settle] WARNING: uncapped re-sim disagrees "
                      "with the decimated settle (see scene_settle.json)")

        with open(os.path.join(self.out_dir, "scene_settle.json"), "w") as f:
            json.dump(report, f, indent=1)
        return translations, report
