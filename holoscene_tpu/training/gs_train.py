"""Standalone free-Gaussian-splatting trainer CLI — the analog of the
reference 3dgrut `train.py` (hydra-driven Trainer3DGRUT, threedgrut/
trainer.py:900-930): dataset in, trained gaussians + eval metrics +
exported artifact out, with checkpoint/resume.

Usage:
  python -m holoscene_tpu.training.gs_train --dataset nerf \
      --data_root path/to/lego --iters 3000 --out out_dir \
      [--strategy mcmc] [--capacity 100000] [--export scene.ply|.usdz|.ingp]
      [--resume]  # continue from out_dir/ckpt.pkl
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_dataset(kind: str, root: str, max_num_images: int = -1):
    if kind == "nerf":
        from holoscene_tpu.datasets.gs_datasets import NerfSyntheticDataset

        return NerfSyntheticDataset(root, max_num_images=max_num_images)
    if kind == "colmap":
        from holoscene_tpu.datasets.gs_datasets import ColmapDataset

        return ColmapDataset(root, max_num_images=max_num_images)
    from holoscene_tpu.datasets.ns_dataset import NSDataset

    return NSDataset(os.path.dirname(root) or ".", os.path.basename(root),
                     max_num_images=max_num_images)


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["nerf", "colmap", "ns"],
                    default="nerf")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out", default="gs_out")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--capacity", type=int, default=100_000)
    ap.add_argument("--strategy", choices=["splatfacto", "mcmc"],
                    default="splatfacto")
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--refine_every", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--eval_every", type=int, default=0)
    ap.add_argument("--ckpt_every", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--export", default="scene.ply",
                    help=".ply / .usdz / .ingp (extension picks the backend)")
    ap.add_argument("--max_num_images", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    from holoscene_tpu.models.gaussians_free import FreeGaussianConfig
    from holoscene_tpu.training.gs_trainer import GSTrainer

    os.makedirs(args.out, exist_ok=True)
    ds = load_dataset(args.dataset, args.data_root, args.max_num_images)
    seed_pts = seed_cols = None
    # COLMAP reconstructions without points3D.bin fall back to random init
    if hasattr(ds, "seed_points") and getattr(ds, "points_xyz", True) is not None:
        seed_pts, seed_cols = ds.seed_points(min(args.capacity, 50_000))

    # COLMAP reconstructions carry a distortion model — train through it
    # (UT projection) rather than pretending the captures are pinhole
    cam = getattr(ds, "camera_model", "pinhole")
    dist = getattr(ds, "dist", None)
    if cam != "pinhole" and not args.quiet:
        print(f"[gs_train] dataset camera: {cam} dist={dist}")
    trainer = GSTrainer(
        ds, FreeGaussianConfig(capacity=args.capacity,
                               sh_degree=args.sh_degree,
                               camera_model=cam, dist=dist),
        seed_points=seed_pts, seed_colors=seed_cols,
        warmup=args.warmup, refine_every=args.refine_every,
        strategy=args.strategy, seed=args.seed, quiet=args.quiet,
    )
    ckpt = os.path.join(args.out, "ckpt.pkl")
    if args.resume and os.path.exists(ckpt):
        trainer.load_checkpoint(ckpt)
        print(f"[gs_train] resumed at iter {trainer.iter_step}")

    remaining = max(args.iters - trainer.iter_step, 0)
    if remaining:
        trainer.run(remaining, eval_every=args.eval_every,
                    ckpt_every=args.ckpt_every, ckpt_path=ckpt)
    trainer.save_checkpoint(ckpt)

    metrics = trainer.eval_split("test" if ds.test else "train")
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    art = trainer.export(os.path.join(args.out, args.export))
    n_alive = int(np.asarray(trainer.state["alive"]).sum())
    print(f"[gs_train] done: {n_alive} gaussians, "
          f"psnr {metrics['psnr']:.2f} ssim {metrics['ssim']:.3f} -> {art}")
    return metrics


if __name__ == "__main__":
    main()
