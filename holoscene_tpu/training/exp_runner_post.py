"""Stage-2 CLI (reference: training/exp_runner_post.py).

Loads the Stage-1 checkpoint from exps/<expname>/<timestamp> and runs the
generative-refinement pipeline; artifacts land in the run's plots dir
(coarse_recon_obj_{i}.ply, vis_info_{i}.pkl, translation_dict.pkl,
graph_node_dict.pkl — the reference layout).
"""

from __future__ import annotations

import argparse
import os

import jax

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.holoscene import HoloSceneConfig, init_holoscene
from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.stage2.refine import FinetuneConfig
from holoscene_tpu.stage2.runner import Stage2Runner
from holoscene_tpu.training import checkpoints as ckpt_lib


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--exps_folder", type=str, default="exps")
    parser.add_argument("--timestamp", type=str, default="latest")
    parser.add_argument("--checkpoint", type=str, default="latest")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--finetune_iters", type=int, default=None)
    parser.add_argument("--mesh_resolution", type=int, default=256)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    conf = ConfigFactory.parse_file(args.conf)
    dataset_conf = conf.get_config("dataset").as_plain_dict()
    if args.data_root:
        dataset_conf["data_root_dir"] = args.data_root
    dataset = NSDataset(**dataset_conf)
    conf.put("model.implicit_network.d_out", len(dataset.label_mapping))

    expname = conf.get_string("train.expname", "holoscene")
    expdir = os.path.join(args.exps_folder, expname)
    timestamp = (
        ckpt_lib.latest_timestamp(expdir)
        if args.timestamp == "latest"
        else args.timestamp
    )
    assert timestamp, f"no Stage-1 run found under {expdir}"
    rundir = os.path.join(expdir, timestamp)

    model_cfg = HoloSceneConfig.from_conf(conf.get_config("model"))
    params = init_holoscene(jax.random.PRNGKey(0), model_cfg)
    params, _, meta = ckpt_lib.load_checkpoint(
        os.path.join(rundir, "checkpoints"), params, None, args.checkpoint
    )
    print(f"[stage2] loaded Stage-1 checkpoint step={meta.get('step', '?')}")

    runner = Stage2Runner(
        params, model_cfg, dataset,
        out_dir=os.path.join(rundir, "plots"),
        loss_cfg=LossConfig.from_conf(conf.get_config("loss")),
        finetune_cfg=FinetuneConfig.from_conf(conf),
        mesh_resolution=args.mesh_resolution,
        quiet=args.quiet,
    )
    return runner.run(finetune_iters=args.finetune_iters)


if __name__ == "__main__":
    main()
