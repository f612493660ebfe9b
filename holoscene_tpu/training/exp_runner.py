"""Stage-1 CLI (reference: training/exp_runner.py:25-96).

Usage:
  python -m holoscene_tpu.training.exp_runner --conf confs/synthetic.conf \
      [--exps_folder exps] [--is_continue] [--timestamp latest] \
      [--checkpoint latest] [--max_niters N] [--data_root DIR] [--quiet]
"""

from __future__ import annotations

import argparse

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.training.stage1 import Stage1Runner


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--expname", type=str, default="",
                        help="suffix appended to train.expname")
    parser.add_argument("--exps_folder", type=str, default="exps")
    parser.add_argument("--ft_folder", type=str, default=None,
                        help="finetune: load checkpoints from this run dir")
    parser.add_argument("--is_continue", action="store_true")
    parser.add_argument("--timestamp", type=str, default="latest")
    parser.add_argument("--checkpoint", type=str, default="latest")
    parser.add_argument("--max_niters", type=int, default=None,
                        help="override train.max_total_iters")
    parser.add_argument("--data_root", type=str, default=None,
                        help="override dataset.data_root_dir")
    parser.add_argument("--no_mesh", action="store_true",
                        help="disable multi-device sharding")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--wandb", action="store_true",
                        help="log to wandb (reference default; falls back to"
                             " JSONL when unavailable)")
    parser.add_argument("--tensorboard", action="store_true")
    args = parser.parse_args(argv)

    conf = ConfigFactory.parse_file(args.conf)
    runner = Stage1Runner(
        conf,
        exps_folder=args.exps_folder,
        data_root_override=args.data_root,
        is_continue=args.is_continue,
        timestamp=args.timestamp,
        checkpoint=args.checkpoint,
        max_total_iters=args.max_niters,
        use_mesh=not args.no_mesh,
        quiet=args.quiet,
        use_wandb=args.wandb,
        use_tensorboard=args.tensorboard,
        expname_suffix=args.expname,
        ft_folder=args.ft_folder,
    )
    runner.run()
    return runner


if __name__ == "__main__":
    main()
