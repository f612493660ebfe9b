"""Stages 2->3->4 on TPU hardware at flagship scale (VERDICT r2 #6).

Resumes the flagship 512^2 Stage-1 checkpoint written by tpu_flagship_run.py
(FLAGSHIP_WORK) and drives refinement + texture + gaussians at real scale,
recording wall-clock, per-stage throughput, and final PSNR/SSIM — the
reference's holoscene_train_post.py -> exp_runner_texture.py ->
exp_runner_gaussian.py chain (SURVEY.md section 3) as one supervised run.

Checkpoints land next to the stage-1 run, so a supervisor restart resumes
stage 4 training (GoM trainer ckpts) instead of redoing it.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.fields import ColorFieldConfig
from holoscene_tpu.models.gom import GoMConfig
from holoscene_tpu.stage2.refine import FinetuneConfig
from holoscene_tpu.stage2.runner import Stage2Runner
from holoscene_tpu.training.stage1 import Stage1Runner
from holoscene_tpu.training.stage3 import Stage3Runner
from holoscene_tpu.training.stage4 import Stage4Runner
from holoscene_tpu.utils.mesh import read_obj

work = os.environ.get("FLAGSHIP_WORK", "/tmp/tpu_flagship")
os.chdir(work)
RES = int(os.environ.get("FLAGSHIP_RES", "512"))

S2_ITERS = int(os.environ.get("CHAIN_S2_ITERS", "300"))
S3_ITERS = int(os.environ.get("CHAIN_S3_ITERS", "1500"))
S4_ITERS = int(os.environ.get("CHAIN_S4_ITERS", "2000"))
MESH_RES = int(os.environ.get("CHAIN_MESH_RES", "256"))
VIEW_RES = int(os.environ.get("CHAIN_VIEW_RES", "256"))

conf = ConfigFactory.parse_file("/root/repo/confs/replica_room0.conf")
conf.put("dataset.data_root_dir", "data")
conf.put("dataset.data_dir", "scene_0")
conf.put("dataset.img_res", [RES, RES])
conf.put("dataset.fix_length", 0)
conf.put("train.expname", "flagship_synth")

t_wall = time.time()
runner1 = Stage1Runner(conf, exps_folder="exps", data_root_override="data",
                       use_mesh=False, quiet=False, is_continue=True,
                       timestamp="latest")
assert runner1.start_iter > 0, "no flagship stage-1 checkpoint to chain from"
print(f"== chain: resumed stage-1 at iter {runner1.start_iter}", flush=True)

timeline = {}

# stage-1 quality column (VERDICT r4 #4: per-stage quality in the timeline)
t0 = time.time()
_s1_eval = runner1.plot(it=runner1.start_iter)
timeline["stage1"] = {
    "iters": runner1.start_iter,
    "eval_psnr": round(float(_s1_eval["psnr"]), 2),
    "eval_wall_s": round(time.time() - t0, 1),
}
print(f"== chain stage1: {json.dumps(timeline['stage1'])}", flush=True)
if os.environ.get("CHAIN_OUT", ""):
    with open(os.environ["CHAIN_OUT"], "w") as f:
        json.dump(timeline, f, indent=1)


def mark(stage, t0, extra=None):
    timeline[stage] = {"wall_s": round(time.time() - t0, 1), **(extra or {})}
    print(f"== chain {stage}: {json.dumps(timeline[stage])}", flush=True)
    with open(os.path.join(runner1.plots_dir, "chain_timeline.json"), "w") as f:
        json.dump(timeline, f, indent=1)
    # mirror incrementally so a wall-clock-bounded session still commits a
    # partial per-stage record (the r5e chain's timeline died with /tmp)
    _out = os.environ.get("CHAIN_OUT", "")
    if _out:
        with open(_out, "w") as f:
            json.dump(timeline, f, indent=1)


t0 = time.time()
runner2 = Stage2Runner(
    runner1.params, runner1.model_cfg, runner1.dataset,
    out_dir=runner1.plots_dir,
    loss_cfg=LossConfig(depth_weight=0.1, semantic_weight=0.5),
    finetune_cfg=FinetuneConfig(iters=S2_ITERS, rays_per_step=1024,
                                invis_pixels=512, collision_pts=1024),
    mesh_resolution=MESH_RES, view_render_res=VIEW_RES,
    candidate_levels=(0.0, 0.003),
    seeds=(42, 43),
    quiet=False,
)
result2 = runner2.run(finetune_iters=S2_ITERS)
meshes = [m for m in result2["meshes"] if m is not None]
mark("stage2", t0, {
    "meshes": len(meshes),
    "failed": result2["failed_objects"],
    "graph_depth": max(v["dist_to_root"] for v in result2["graph"].values()),
})

t0 = time.time()
runner3 = Stage3Runner(
    result2["meshes"], runner1.dataset,
    cfg=ColorFieldConfig(),
    max_total_iters=S3_ITERS, pixels_per_step=4096,
    out_dir=runner1.plots_dir, texture_res=1024, quiet=False,
)
objects = [i for i, m in enumerate(result2["meshes"]) if m is not None]
tex_paths = runner3.run(objects=objects, n_iters=S3_ITERS)
mark("stage3", t0, {"textured": len(tex_paths),
                    "px_per_s": round(S3_ITERS * 4096 * len(objects)
                                      / max(time.time() - t0, 1e-9))})

t0 = time.time()
baked = [read_obj(p) for p in tex_paths]
# bake stage-3 textures into vertex colors + cap faces + budget-derive the
# subdivision threshold (the tpu_chain_stage4.py fixes, ported: a fixed
# 1e-5 threshold on a ~450k-face baked bg mesh seeds millions of gaussians
# — the r5 fresh chain was host-OOM-killed at 130 GB RSS exactly here)
from PIL import Image

for m, p in zip(baked, tex_paths):
    png = p.replace(".obj", ".png")
    if m.uvs is not None and len(m.uvs) == len(m.vertices) \
            and os.path.exists(png):
        tex = np.asarray(Image.open(png).convert("RGB"))
        hgt, wdt = tex.shape[:2]
        u = np.clip(m.uvs[:, 0], 0, 1)
        v = np.clip(m.uvs[:, 1], 0, 1)
        px = np.clip((u * (wdt - 1)).round().astype(int), 0, wdt - 1)
        py = np.clip(((1.0 - v) * (hgt - 1)).round().astype(int), 0, hgt - 1)
        m.vertex_colors = tex[py, px]
max_faces = int(os.environ.get("CHAIN_S4_MAX_FACES", "150000"))
baked = [m.decimate(max_faces) if len(m.faces) > max_faces else m
         for m in baked]
target_g = int(os.environ.get("CHAIN_S4_TARGET_G", "300000"))


def _tri_area(m):
    v, f = np.asarray(m.vertices), np.asarray(m.faces)
    c = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    return float(np.linalg.norm(c, axis=1).sum() / 2)


area_sub = max(1e-5, sum(_tri_area(m) for m in baked) / target_g)
print(f"== stage4 seeding: faces {[len(m.faces) for m in baked]}, "
      f"area_to_subdivide {area_sub:.2e}", flush=True)
runner4 = Stage4Runner(
    baked, runner1.dataset, cfg=GoMConfig(sh_degree=3, max_per_tile=0),
    area_to_subdivide=area_sub, max_total_iters=S4_ITERS,
    out_dir=runner1.plots_dir, quiet=False,
)
# vis packs by ORIGINAL object id (failed objects leave holes in
# tex_paths, so position-based load_vis_info would misalign)
import pickle

for slot, p in enumerate(tex_paths):
    k = int(os.path.basename(p).split("_")[1].split(".")[0])
    name = "bg_info.pkl" if k == 0 else f"vis_info_{k}.pkl"
    vp = os.path.join(runner1.plots_dir, name)
    if os.path.exists(vp):
        with open(vp, "rb") as f:
            runner4.vis_info_list[slot] = pickle.load(f)
hist4 = runner4.run(n_iters=S4_ITERS, log_every=100)
metrics = runner4.eval_split("train", max_frames=4)
runner4.export()
n_g = int(runner4.static["num_gaussians"])
ls4 = [h["loss"] for h in hist4]
q4 = max(len(ls4) // 4, 1)
mark("stage4", t0, {
    "psnr": round(metrics["psnr"], 2),
    "ssim": round(metrics["ssim"], 4),
    "lpips": (round(metrics["lpips"], 4)
              if np.isfinite(metrics.get("lpips", float("nan"))) else None),
    "gaussians": n_g,
    "iters": S4_ITERS,
    "stale_steps": runner4.stale_steps,
    # convergence evidence: quartile-median loss trend over the run
    "loss_quartile_medians": [
        round(float(np.median(ls4[i * q4:(i + 1) * q4] or ls4[-q4:])), 2)
        for i in range(4)],
})

mark("total", t_wall)
# commit-ready artifact: chain quality tracked round-over-round like bench
chain_out = os.environ.get("CHAIN_OUT", "")
if chain_out:
    with open(chain_out, "w") as f:
        json.dump(timeline, f, indent=1)
    print(f"== timeline copied to {chain_out}", flush=True)
print(f"== CHAIN DONE psnr={metrics['psnr']:.2f} ssim={metrics['ssim']:.3f} "
      f"wall={time.time()-t_wall:.0f}s", flush=True)
