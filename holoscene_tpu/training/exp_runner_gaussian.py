"""Stage-4 CLI (reference: training/exp_runner_gaussian_on_mesh.py).

Loads Stage-3 textured meshes (surface_{i}.obj) and trains Gaussian-on-Mesh
appearance; exports gauss_obj_{i}.ply + gauss_scene.ply and prints
PSNR/SSIM/LPIPS on the train/test splits.
"""

from __future__ import annotations

import argparse
import glob
import os

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.models.gom import GoMConfig
from holoscene_tpu.training import checkpoints as ckpt_lib
from holoscene_tpu.training.stage4 import Stage4Runner
from holoscene_tpu.utils.mesh import read_obj, read_ply


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--exps_folder", type=str, default="exps")
    parser.add_argument("--timestamp", type=str, default="latest")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--max_niters", type=int, default=None)
    parser.add_argument("--area_to_subdivide", type=float, default=1e-5)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument(
        "--use_pallas", default=None, action="store_true",
        help="force the fused Pallas tile kernels (default: auto on TPU)",
    )
    parser.add_argument(
        "--max_per_tile", type=int, default=0,
        help="compositing depth K per tile; 0 = auto from p99 tile overlap",
    )
    parser.add_argument(
        "--rebin_every", type=int, default=8,
        help="flat-path per-frame-visit bin refresh cadence",
    )
    parser.add_argument(
        "--rebin_drift_px", type=float, default=0.0,
        help="adaptive rebinning: rebin on > this many px of measured "
             "projected drift (0 = fixed cadence)",
    )
    args = parser.parse_args(argv)

    conf = ConfigFactory.parse_file(args.conf)
    dataset_conf = conf.get_config("dataset").as_plain_dict()
    if args.data_root:
        dataset_conf["data_root_dir"] = args.data_root
    dataset = NSDataset(**dataset_conf)

    expname = conf.get_string("train.expname", "holoscene")
    expdir = os.path.join(args.exps_folder, expname)
    timestamp = (
        ckpt_lib.latest_timestamp(expdir)
        if args.timestamp == "latest"
        else args.timestamp
    )
    plots_dir = os.path.join(expdir, timestamp, "plots")

    obj_paths = sorted(
        glob.glob(os.path.join(plots_dir, "surface_*.obj")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
    )
    if obj_paths:
        meshes = [read_obj(p) for p in obj_paths]
    else:  # fall back to untextured Stage-2 meshes
        ply_paths = sorted(
            glob.glob(os.path.join(plots_dir, "coarse_recon_obj_*.ply")),
            key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
        )
        assert ply_paths, f"no meshes under {plots_dir}"
        meshes = [read_ply(p) for p in ply_paths]
    print(f"[stage4] {len(meshes)} meshes from {plots_dir}")

    runner = Stage4Runner(
        meshes, dataset,
        cfg=GoMConfig(use_pallas=args.use_pallas,
                      max_per_tile=args.max_per_tile,
                      rebin_every=args.rebin_every,
                      rebin_drift_px=args.rebin_drift_px),
        area_to_subdivide=args.area_to_subdivide,
        max_total_iters=args.max_niters,
        out_dir=plots_dir,
        quiet=args.quiet,
    )
    runner.run()
    metrics = runner.eval_split("test")
    print(f"[stage4] test: {metrics}")
    runner.export()
    return runner


if __name__ == "__main__":
    main()
