"""Stage-3 CLI (reference: training/exp_runner_texture.py).

Loads Stage-2 meshes (coarse_recon_obj_{i}.ply) from the run dir and trains
+ bakes per-object textures into surface_{i}.obj/.mtl/.png.
"""

from __future__ import annotations

import argparse
import glob
import os

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.training import checkpoints as ckpt_lib
from holoscene_tpu.training.stage3 import Stage3Runner
from holoscene_tpu.utils.mesh import read_ply


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--exps_folder", type=str, default="exps")
    parser.add_argument("--timestamp", type=str, default="latest")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--max_niters", type=int, default=5000)
    parser.add_argument("--texture_res", type=int, default=2048)
    parser.add_argument("--quiet", action="store_true")
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

    mesh_paths = sorted(
        glob.glob(os.path.join(plots_dir, "coarse_recon_obj_*.ply")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
    )
    assert mesh_paths, f"no Stage-2 meshes under {plots_dir}"
    meshes = [read_ply(p) for p in mesh_paths]
    print(f"[stage3] {len(meshes)} meshes from {plots_dir}")

    runner = Stage3Runner(
        meshes, dataset,
        lr=conf.get_float("train.learning_rate", 5e-4),
        lr_factor_for_grid=conf.get_float("train.lr_factor_for_grid", 20.0),
        max_total_iters=args.max_niters,
        out_dir=plots_dir,
        texture_res=args.texture_res,
        quiet=args.quiet,
    )
    return runner.run()


if __name__ == "__main__":
    main()
