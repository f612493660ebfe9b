"""Quality validation on the real TPU: train Stage 1 on the synthetic scene
and report PSNR progression + chamfer of the extracted background mesh."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu
holoscene_tpu.setup_compile_cache()  # fast re-compile on supervisor restart
from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.training.stage1 import Stage1Runner

work = os.environ.get("QUALITY_WORK", "/tmp/tpu_quality")
RES = int(os.environ.get("QUALITY_RES", "128"))
ITERS = int(os.environ.get("QUALITY_ITERS", "2500"))
os.makedirs(work, exist_ok=True)
os.chdir(work)
if not os.path.exists("data/scene_0/transforms.json"):
    generate_scene("data/scene_0", n_images=16, img_res=(RES, RES))

conf = ConfigFactory.parse_file("/root/repo/confs/synthetic.conf")
conf.put("dataset.img_res", [RES, RES])
conf.put("train.num_pixels", 1024)
conf.put("model.implicit_network.num_levels", 12)
conf.put("model.implicit_network.logmap", 17)
conf.put("model.implicit_network.end_size", 512)
conf.put("model.implicit_network.dims", [128, 128])
conf.put("model.implicit_network.feature_vector_size", 128)
conf.put("model.feature_vector_size", 128)
conf.put("model.rendering_network.dims", [128, 128])
conf.put("model.ray_sampler.N_samples", 48)
# gate-scale default 96; QUALITY_EVAL_SAMPLES gates the eval-probe-count
# reduction (bench A/B r4e: 128->64 = +8.6% rays/s at flagship shapes)
conf.put("model.ray_sampler.N_samples_eval",
         int(os.environ.get("QUALITY_EVAL_SAMPLES", "96")))
conf.put("model.ray_sampler.N_samples_extra", 24)
conf.put("model.ray_sampler.max_total_iters",
         int(os.environ.get("QUALITY_SAMPLER_ITERS", "4")))
conf.put("train.checkpoint_freq", 500)  # wedge-restart resume granularity

runner = Stage1Runner(conf, exps_folder="exps", data_root_override="data",
                      use_mesh=False, quiet=False)
# use the coarse-sampler fast path like the bench
import dataclasses
_top_m = int(os.environ.get("QUALITY_TOP_M", "0"))
_grad_mode = os.environ.get("QUALITY_GRAD_MODE", "vjp")
_dual = os.environ.get("QUALITY_DUAL", "0") == "1"
_interp = os.environ.get("QUALITY_INTERP", "trilinear")
_fetch = os.environ.get("QUALITY_FUSED_FETCH", "packed")
_cbwd = os.environ.get("QUALITY_COLOR_BWD", "0") == "1"
_sbwd = _cbwd and os.environ.get("QUALITY_SDF_BWD", "0") == "1"
runner.model_cfg = dataclasses.replace(
    runner.model_cfg, sampler_grid_levels=8, render_top_m=_top_m,
    render_fine_top_f=int(os.environ.get("QUALITY_FINE_TOP_F", "0")),
    render_fine_levels=int(os.environ.get("QUALITY_FINE_LEVELS", "8")),
    forward_grad_mode=_grad_mode,
    implicit=dataclasses.replace(
        runner.model_cfg.implicit,
        fused_dual_grid=_dual,
        grid_interp=_interp,
        fused_fetch=_fetch,
        color_bwd_sample=_cbwd,
        sdf_bwd_sample=_sbwd,
        dense_max_res=int(os.environ.get("QUALITY_DENSE_MAX_RES", "0"))))
_probe_res = int(os.environ.get("QUALITY_PROBE_GRID", "0"))
if _probe_res:
    from holoscene_tpu.models.holoscene import make_probe_bake

    runner.model_cfg = dataclasses.replace(
        runner.model_cfg, probe_grid_res=_probe_res,
        probe_update_every=int(os.environ.get("QUALITY_PROBE_EVERY", "16")))
    runner._probe_bake = make_probe_bake(runner.model_cfg)
_occ = os.environ.get("QUALITY_OCC", "0") == "1"
if _occ:
    from holoscene_tpu.ops.occupancy import OccGridConfig, init_occ_grid

    runner.model_cfg = dataclasses.replace(
        runner.model_cfg, use_occupancy=True,
        occupancy=OccGridConfig(
            bound=runner.model_cfg.scene_bounding_sphere))
    runner.occ = init_occ_grid(runner.model_cfg.occupancy)
print(f"quality run: top_m={_top_m} grad_mode={_grad_mode} dual={_dual} "
      f"interp={_interp} fetch={_fetch} color_bwd_sample={_cbwd} "
      f"sdf_bwd_sample={_sbwd} occ={_occ}", flush=True)
from holoscene_tpu.training.stage1 import make_train_step, make_eval_render
runner.train_step = make_train_step(runner.model_cfg, runner.loss_cfg, runner.optimizer)
runner.render_frame = make_eval_render(runner.model_cfg)

t0 = time.time()
runner.run(n_iters=ITERS, log_every=250)
print(f"train wall: {time.time()-t0:.0f}s", flush=True)
out = runner.plot(it=ITERS)
print(f"FINAL eval psnr: {out['psnr']:.2f}", flush=True)

# geometry check: extracted background mesh vs analytic room
meshes = runner.extract_meshes(resolution=96, prune=False, save=False)
from holoscene_tpu.utils.eval_geometry import calc_3d_metric
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh
scale = 1.3
ax = np.linspace(-1, 1, 64)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
room = -(np.maximum.reduce([abs(x), abs(y), abs(z)]) - 1.0/scale)
v, f = marching_tetrahedra(room, origin=(-1,)*3, spacing=(2/63,)*3)
gt_room = Mesh(v, f)
if meshes[0] is not None:
    m = calc_3d_metric(meshes[0], gt_room, n_samples=30000, align=False)
    print(f"bg chamfer: {m}", flush=True)
for i, mm in enumerate(meshes):
    print(f"mesh {i}: {'None' if mm is None else len(mm.faces)} faces", flush=True)
