"""End-to-end 4-stage pipeline demo on a procedural synthetic scene.

Runs: scene generation -> Stage 1 (SDF reconstruction) -> mesh extraction ->
Stage 2 (refinement + physics + scene graph) -> Stage 3 (texture baking) ->
Stage 4 (gaussian-on-mesh) -> GLB/USD export, and prints the metric trail.

Scaled for a CPU smoke run (~10-15 min); raise --img_res/--*_iters for a
TPU-sized run (e.g. --img_res 256 --stage1_iters 5000 --stage4_iters 2000).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--stage1_iters", type=int, default=300)
    parser.add_argument("--stage2_iters", type=int, default=20)
    parser.add_argument("--stage3_iters", type=int, default=150)
    parser.add_argument("--stage4_iters", type=int, default=150)
    parser.add_argument("--img_res", type=int, default=48)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from holoscene_tpu.config import ConfigFactory
    from holoscene_tpu.datasets.synthetic import generate_scene
    from holoscene_tpu.export.glb import export_glb
    from holoscene_tpu.export.usd import export_usd
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.fields import ColorFieldConfig
    from holoscene_tpu.models.gom import GoMConfig
    from holoscene_tpu.stage2.refine import FinetuneConfig
    from holoscene_tpu.stage2.runner import Stage2Runner
    from holoscene_tpu.training.stage1 import Stage1Runner
    from holoscene_tpu.training.stage3 import Stage3Runner
    from holoscene_tpu.training.stage4 import Stage4Runner
    from holoscene_tpu.utils.mesh import read_obj

    work = args.workdir or tempfile.mkdtemp(prefix="holoscene_demo_")
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    print(f"== workdir {work}")

    res = (args.img_res, args.img_res)
    generate_scene("data/scene_0", n_images=10, img_res=res)
    print("== stage 0: synthetic scene written")

    conf = ConfigFactory.parse_file(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "confs", "synthetic.conf")
    )
    conf.put("dataset.img_res", list(res))
    conf.put("train.num_pixels", 256)
    runner1 = Stage1Runner(conf, exps_folder="exps", data_root_override="data",
                           use_mesh=False, quiet=True)
    runner1.run(n_iters=args.stage1_iters, log_every=max(args.stage1_iters // 4, 1))
    plot = runner1.plot(it=args.stage1_iters)
    print(f"== stage 1: {args.stage1_iters} iters, eval psnr {plot['psnr']:.2f}")

    runner2 = Stage2Runner(
        runner1.params, runner1.model_cfg, runner1.dataset,
        out_dir=runner1.plots_dir,
        loss_cfg=LossConfig(depth_weight=0.1, semantic_weight=0.5),
        finetune_cfg=FinetuneConfig(iters=args.stage2_iters, rays_per_step=128,
                                    invis_pixels=128, collision_pts=256),
        mesh_resolution=64, view_render_res=32, candidate_levels=(0.0,),
        quiet=True,
    )
    result2 = runner2.run(finetune_iters=args.stage2_iters)
    meshes = [m for m in result2["meshes"] if m is not None]
    print(f"== stage 2: {len(meshes)} meshes accepted, "
          f"graph depth {max(v['dist_to_root'] for v in result2['graph'].values())}, "
          f"failed {result2['failed_objects']}")

    runner3 = Stage3Runner(
        result2["meshes"], runner1.dataset,
        cfg=ColorFieldConfig(num_levels=6, logmap=14, end_size=128, hidden=64),
        max_total_iters=args.stage3_iters, pixels_per_step=1024,
        out_dir=runner1.plots_dir, texture_res=256, quiet=True,
    )
    tex_paths = runner3.run(
        objects=[i for i, m in enumerate(result2["meshes"]) if m is not None],
        n_iters=args.stage3_iters,
    )
    print(f"== stage 3: baked {len(tex_paths)} textured meshes")

    baked = [read_obj(p) for p in tex_paths]
    runner4 = Stage4Runner(
        baked, runner1.dataset, cfg=GoMConfig(sh_degree=1, max_per_tile=128),
        area_to_subdivide=5e-3, max_total_iters=args.stage4_iters,
        out_dir=runner1.plots_dir, quiet=True,
    )
    runner4.load_vis_info(runner1.plots_dir)
    runner4.run(n_iters=args.stage4_iters, log_every=max(args.stage4_iters // 3, 1))
    metrics = runner4.eval_split("train", max_frames=3)
    runner4.export()
    print(f"== stage 4: psnr {metrics['psnr']:.2f} ssim {metrics['ssim']:.3f}")

    pngs = []
    for i, p in enumerate(tex_paths):
        png_path = p.replace(".obj", ".png")
        pngs.append(open(png_path, "rb").read() if os.path.exists(png_path) else None)
    export_glb(os.path.join(runner1.plots_dir, "scene.glb"), baked,
               textures_png=pngs,
               translations={i: np.asarray(t) for i, t in
                             result2["translations"].items()})
    export_usd(os.path.join(runner1.plots_dir, "usd"), result2["meshes"],
               translations=result2["translations"])
    print(f"== export: scene.glb + usd/ in {runner1.plots_dir}")
    print("== pipeline complete")


if __name__ == "__main__":
    main()
