"""Flagship-config quality run: full 16-level 2^19 grids on the synthetic
scene at 192^2 — evidence that the production model trains on hardware."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import holoscene_tpu
holoscene_tpu.setup_compile_cache()  # fast re-compile on supervisor restart
from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.training.stage1 import Stage1Runner, make_train_step, make_eval_render

work = os.environ.get("FLAGSHIP_WORK", "/tmp/tpu_flagship")
os.makedirs(work, exist_ok=True)
os.chdir(work)
RES = int(os.environ.get("FLAGSHIP_RES", "192"))
if not os.path.exists("data/scene_0/transforms.json"):
    generate_scene("data/scene_0", n_images=20, img_res=(RES, RES))

conf = ConfigFactory.parse_file("/root/repo/confs/replica_room0.conf")
conf.put("dataset.data_root_dir", "data")
conf.put("dataset.data_dir", "scene_0")
conf.put("dataset.img_res", [RES, RES])
conf.put("dataset.fix_length", 0)
conf.put("train.expname", "flagship_synth")
conf.put("train.checkpoint_freq", int(os.environ.get("FLAGSHIP_CKPT_FREQ", 400)))
_iters_default = int(os.environ.get("FLAGSHIP_ITERS", 2200))
conf.put("train.exact_bwd_from_iter",
         int(os.environ.get("FLAGSHIP_EXACT_FROM", int(_iters_default * 0.8))))

# resume on supervisor restart (the axon relay can wedge mid-stream;
# latest_timestamp=None on the first run falls through to a fresh dir)
runner = Stage1Runner(conf, exps_folder="exps", data_root_override="data",
                      use_mesh=False, quiet=False,
                      is_continue=os.environ.get("FLAGSHIP_CONTINUE", "1") == "1",
                      timestamp="latest")
import dataclasses
runner.model_cfg = dataclasses.replace(
    runner.model_cfg, sampler_grid_levels=8, use_bg_reg=False,
    render_top_m=int(os.environ.get("FLAGSHIP_TOP_M", "64")),
    render_fine_top_f=int(os.environ.get("FLAGSHIP_FINE_TOP_F", "32")),
    render_fine_levels=int(os.environ.get("FLAGSHIP_FINE_LEVELS", "6")),
    forward_grad_mode=os.environ.get("FLAGSHIP_GRAD_MODE", "fused"),
    implicit=dataclasses.replace(
        runner.model_cfg.implicit,
        fused_dual_grid=os.environ.get("FLAGSHIP_DUAL", "1") == "1",
        grid_interp=os.environ.get("FLAGSHIP_INTERP", "trilinear"),
        dense_max_res=int(os.environ.get("FLAGSHIP_DENSE_MAX_RES", "0")),
        color_bwd_sample=(_cb := os.environ.get("FLAGSHIP_COLOR_BWD", "1") == "1"),
        sdf_bwd_sample=_cb and os.environ.get("FLAGSHIP_SDF_BWD", "1") == "1",
    ),
)
if os.environ.get("FLAGSHIP_OCC", "0") == "1":
    from holoscene_tpu.ops.occupancy import OccGridConfig, init_occ_grid

    runner.model_cfg = dataclasses.replace(
        runner.model_cfg, use_occupancy=True,
        occupancy=OccGridConfig(
            bound=runner.model_cfg.scene_bounding_sphere))
    runner.occ = init_occ_grid(runner.model_cfg.occupancy)
_pg = int(os.environ.get("FLAGSHIP_PROBE_GRID", "0"))
if _pg:
    from holoscene_tpu.models.holoscene import make_probe_bake

    runner.model_cfg = dataclasses.replace(
        runner.model_cfg, probe_grid_res=_pg,
        probe_update_every=int(os.environ.get("FLAGSHIP_PROBE_EVERY", "64")))
    runner._probe_bake = make_probe_bake(runner.model_cfg)
print(f"flagship cfg: top_m={runner.model_cfg.render_top_m} "
      f"dual={runner.model_cfg.implicit.fused_dual_grid} "
      f"interp={runner.model_cfg.implicit.grid_interp} "
      f"occ={runner.model_cfg.use_occupancy} "
      f"probe_grid={runner.model_cfg.probe_grid_res}", flush=True)
runner.train_step = make_train_step(runner.model_cfg, runner.loss_cfg, runner.optimizer)
runner.render_frame = make_eval_render(runner.model_cfg)

t0 = time.time()
_target = int(os.environ.get("FLAGSHIP_ITERS", 2200))
runner.run(n_iters=max(0, _target - runner.start_iter), log_every=100)
print(f"train wall: {time.time()-t0:.0f}s", flush=True)
# train-frame-0 PSNR first (comparable with the recorded exact/sampled
# rows), then the honest numbers: multi-frame train mean + held-out test
# frames (single-frame PSNR is +-0.5 dB noisy on this scene)
psnrs = [runner.plot(it=runner.start_iter, frame_idx=f)["psnr"]
         for f in (0, 5, 10, 15)]
n_test = len(runner.dataset.test["pose_all"]) if runner.dataset.test else 0
test_psnrs = [
    runner.plot(it=runner.start_iter, frame_idx=f, split="test")["psnr"]
    for f in range(n_test)
]
print(f"FLAGSHIP FINAL eval psnr: {psnrs[0]:.2f} "
      f"(train mean over {len(psnrs)}: {np.mean(psnrs):.2f}; "
      f"test mean over {n_test}: "
      f"{np.mean(test_psnrs) if test_psnrs else float('nan'):.2f})",
      flush=True)
