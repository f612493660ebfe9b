"""Resume the hardware chain at stage 4 from the on-disk stage-3 artifacts
(r4a ran stages 1->2->3 on the chip; stage 4 crashed on the
closure-constant compile-payload bug, fixed since — this finishes the
chain without redoing the 75-minute stage 2)."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.models.gom import GoMConfig
from holoscene_tpu.training.stage4 import Stage4Runner
from holoscene_tpu.utils.mesh import read_obj

work = os.environ.get("FLAGSHIP_WORK", "/tmp/tpu_chain_mini")
RES = int(os.environ.get("FLAGSHIP_RES", "256"))
S4_ITERS = int(os.environ.get("CHAIN_S4_ITERS", "500"))

runs = sorted(glob.glob(os.path.join(
    work, "exps", "flagship_synth", "*", "plots")))
assert runs, f"no run dirs under {work}"
plots_dir = runs[-1]
tex_paths = sorted(glob.glob(os.path.join(plots_dir, "surface_*.obj")))
assert tex_paths, f"no stage-3 textured meshes in {plots_dir}"
print(f"resuming stage 4 from {plots_dir}: {len(tex_paths)} textured meshes",
      flush=True)

conf = ConfigFactory.parse_file("/root/repo/confs/replica_room0.conf")
dataset = NSDataset(os.path.join(work, "data"), "scene_0",
                    img_res=(RES, RES))

t0 = time.time()
baked = [read_obj(p) for p in tex_paths]
# bake the stage-3 texture into per-vertex colors (read_obj keeps UVs but
# not colors; gaussian seeding inits features_dc from vertex colors — the
# first completed chain run seeded grey and spent its 500 iters
# relearning color from scratch: PSNR 10.3)
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
        py = np.clip(((1.0 - v) * (hgt - 1)).round().astype(int), 0,
                     hgt - 1)
        m.vertex_colors = tex[py, px]
# one v5e: cap the gaussian count — stage-3 bakes the bg at texture-grade
# ~530k faces, and seeding one gaussian per (subdivided) face plus Adam
# state plus the span-5x7 binning expansion exceeds 16 GB HBM (r4d/r4e
# OOMs). 256² supervision doesn't resolve that face density anyway.
max_faces = int(os.environ.get("CHAIN_S4_MAX_FACES", "150000"))
baked = [m.decimate(max_faces) if len(m.faces) > max_faces else m
         for m in baked]
print(f"stage-4 meshes: {[len(m.faces) for m in baked]} faces", flush=True)

# pick the subdivision threshold from a TOTAL gaussian budget: seeding is
# one gaussian per subdivided face, and a fixed area threshold explodes a
# room-scale mesh into millions of slots (the r4e retry OOM'd at ~2M)
target_g = int(os.environ.get("CHAIN_S4_TARGET_G", "300000"))


def _area(m):
    v, f = np.asarray(m.vertices), np.asarray(m.faces)
    c = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    return float(np.linalg.norm(c, axis=1).sum() / 2)


total_area = sum(_area(m) for m in baked)
area_sub = max(1e-5, total_area / target_g)
print(f"total area {total_area:.2f} -> area_to_subdivide {area_sub:.2e} "
      f"(target ~{target_g} gaussians)", flush=True)
runner4 = Stage4Runner(
    baked, dataset, cfg=GoMConfig(sh_degree=3, max_per_tile=0),
    area_to_subdivide=area_sub, max_total_iters=S4_ITERS,
    out_dir=plots_dir, quiet=False,
)
print(f"gaussians: {int(runner4.static['num_gaussians'])}", flush=True)
# vis packs by ORIGINAL object id parsed from surface_{k}.obj (failed
# objects leave holes, so position-based load_vis_info would misalign)
import pickle

for slot, p in enumerate(tex_paths):
    k = int(os.path.basename(p).split("_")[1].split(".")[0])
    name = "bg_info.pkl" if k == 0 else f"vis_info_{k}.pkl"
    vp = os.path.join(plots_dir, name)
    if os.path.exists(vp):
        with open(vp, "rb") as f:
            runner4.vis_info_list[slot] = pickle.load(f)
hist4 = runner4.run(n_iters=S4_ITERS, log_every=100)
metrics = runner4.eval_split("train", max_frames=4)
runner4.export()
n_g = int(runner4.static["num_gaussians"])
wall = time.time() - t0

timeline_path = os.path.join(plots_dir, "chain_timeline.json")
timeline = {}
if os.path.exists(timeline_path):
    with open(timeline_path) as f:
        timeline = json.load(f)
ls4 = [h["loss"] for h in hist4]
q4 = max(len(ls4) // 4, 1)
timeline["stage4"] = {
    "wall_s": round(wall, 1), "psnr": round(metrics["psnr"], 2),
    "ssim": round(metrics["ssim"], 4),
    "lpips": (round(metrics["lpips"], 4)
              if np.isfinite(metrics.get("lpips", float("nan"))) else None),
    "gaussians": n_g,
    "iters": S4_ITERS,
    "splats_per_sec": round(n_g * S4_ITERS / wall),
    "stale_steps": runner4.stale_steps,
    "rebin_count": runner4.rebin_count,
    "loss_quartile_medians": [
        round(float(np.median(ls4[i * q4:(i + 1) * q4] or ls4[-q4:])), 2)
        for i in range(4)],
    "resumed": True,
}
with open(timeline_path, "w") as f:
    json.dump(timeline, f, indent=1)
chain_out = os.environ.get("CHAIN_OUT", "")
if chain_out:
    with open(chain_out, "w") as f:
        json.dump(timeline, f, indent=1)
    print(f"== timeline copied to {chain_out}", flush=True)
print(f"== chain stage4: {json.dumps(timeline['stage4'])}", flush=True)
print(f"== CHAIN DONE psnr={metrics['psnr']:.2f} "
      f"ssim={metrics['ssim']:.3f}", flush=True)
