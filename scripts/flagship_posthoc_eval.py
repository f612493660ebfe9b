"""Post-hoc geometry eval for a finished tpu_flagship_run: load the latest
checkpoint, extract meshes, and report bg chamfer vs the analytic room
(the VERDICT flagship-gate row: eval PSNR comes from the run's log).

Usage: PYTHONPATH=... python scripts/flagship_posthoc_eval.py \
    --work /tmp/tpu_flagship512 [--grad_mode fused] [--top_m 64]
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.training.stage1 import Stage1Runner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/tpu_flagship512")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--grad_mode", default="fused")
    ap.add_argument("--top_m", type=int, default=64)
    ap.add_argument("--mesh_res", type=int, default=96)
    args = ap.parse_args()

    os.chdir(args.work)
    conf = ConfigFactory.parse_file("/root/repo/confs/replica_room0.conf")
    conf.put("dataset.data_root_dir", "data")
    conf.put("dataset.data_dir", "scene_0")
    conf.put("dataset.img_res", [args.res, args.res])
    conf.put("dataset.fix_length", 0)
    conf.put("train.expname", "flagship_synth")

    runner = Stage1Runner(conf, exps_folder="exps", data_root_override="data",
                          use_mesh=False, quiet=True, is_continue=True,
                          timestamp="latest")
    import dataclasses

    runner.model_cfg = dataclasses.replace(
        runner.model_cfg, sampler_grid_levels=8, use_bg_reg=False,
        render_top_m=args.top_m, forward_grad_mode=args.grad_mode,
        implicit=dataclasses.replace(
            runner.model_cfg.implicit, fused_dual_grid=True,
        ),
    )
    print(f"loaded checkpoint at iter {runner.start_iter}", flush=True)

    meshes = runner.extract_meshes(resolution=args.mesh_res, prune=False,
                                   save=False)
    from holoscene_tpu.utils.eval_geometry import calc_3d_metric
    from holoscene_tpu.utils.mc import marching_tetrahedra
    from holoscene_tpu.utils.mesh import Mesh

    scale = 1.3
    ax = np.linspace(-1, 1, 64)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    room = -(np.maximum.reduce([abs(x), abs(y), abs(z)]) - 1.0 / scale)
    v, f = marching_tetrahedra(room, origin=(-1,) * 3, spacing=(2 / 63,) * 3)
    gt_room = Mesh(v, f)
    if meshes[0] is not None:
        m = calc_3d_metric(meshes[0], gt_room, n_samples=30000, align=False)
        print(f"bg chamfer: {m}", flush=True)
    for i, mm in enumerate(meshes):
        print(f"mesh {i}: {'None' if mm is None else len(mm.faces)} faces",
              flush=True)


if __name__ == "__main__":
    main()
