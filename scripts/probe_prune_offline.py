"""Offline (CPU) quantification of the render-path knobs' approximation
error on a REAL trained flagship checkpoint: compare training-mode renders
at several render_top_m / sampler_grid_levels settings against the
unpruned full-quadrature render on IDENTICAL rays + identical sampler RNG.

This isolates the knob's quadrature/placement error from training noise —
evidence for shipping a faster default without burning a TPU training run
per candidate. (Training-dynamics risk still needs the 2500-iter TPU gate
for the winner.)

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_prune_offline.py \
      --work /tmp/tpu_flagship512_sampled [--rays 4096] [--frames 0 5 10]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu

holoscene_tpu.honor_platform_env()
holoscene_tpu.setup_compile_cache()

import jax
import jax.numpy as jnp

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.models.holoscene import render_rays
from holoscene_tpu.training.stage1 import Stage1Runner, rays_from_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/tpu_flagship512_sampled")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--frames", type=int, nargs="+", default=[0, 5, 10])
    ap.add_argument("--top_m", type=int, nargs="+",
                    default=[0, 64, 56, 48, 40, 32])
    ap.add_argument("--sampler_levels", type=int, nargs="+",
                    default=[8, 6, 5, 4])
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
    print(f"checkpoint iter {runner.start_iter}", flush=True)
    base_cfg = dataclasses.replace(
        runner.model_cfg, use_bg_reg=False, forward_grad_mode="fused",
        implicit=dataclasses.replace(runner.model_cfg.implicit,
                                     fused_dual_grid=True),
    )

    rng = np.random.default_rng(0)
    h, w = runner.dataset.img_res

    def make_render(top_m, slv):
        cfg = dataclasses.replace(base_cfg, render_top_m=int(top_m),
                                  sampler_grid_levels=int(slv))

        @jax.jit
        def r(params, uv, pose, intr):
            rays_o, rays_d, dscale, w2c = rays_from_batch(uv, pose, intr)
            out = render_rays(params, cfg, jax.random.PRNGKey(7), rays_o,
                              rays_d, dscale, w2c, training=True,
                              compute_eikonal=False)
            return out["rgb_values"], out["depth_values"], out["normal_map"]

        return r

    for frame in args.frames:
        sample, gt = runner.dataset.full_frame(frame)
        pick = rng.choice(h * w, size=args.rays, replace=False)
        uv = jnp.asarray(np.asarray(sample["uv"])[pick])
        pose, intr = sample["pose"], sample["intrinsics"]
        gt_rgb = np.asarray(gt["rgb"])[pick]

        ref_rgb, ref_d, ref_n = jax.tree_util.tree_map(
            np.asarray, make_render(0, 8)(runner.params, uv, pose, intr)
        )
        ref_psnr = -10 * np.log10(np.mean((ref_rgb - gt_rgb) ** 2) + 1e-12)
        print(f"\nframe {frame}: full render vs GT psnr {ref_psnr:.2f}",
              flush=True)
        print(f"{'variant':24s} {'vsfull(dB)':>10s} {'vsGT(dB)':>9s} "
              f"{'depth|d|':>9s} {'norm|d|':>8s}", flush=True)

        def report(name, fn):
            rgb, d, n = jax.tree_util.tree_map(
                np.asarray, fn(runner.params, uv, pose, intr)
            )
            vs_full = -10 * np.log10(np.mean((rgb - ref_rgb) ** 2) + 1e-12)
            vs_gt = -10 * np.log10(np.mean((rgb - gt_rgb) ** 2) + 1e-12)
            dd = np.abs(d - ref_d).mean()
            dn = np.abs(n - ref_n).mean()
            print(f"{name:24s} {vs_full:10.2f} {vs_gt:9.2f} {dd:9.4f} "
                  f"{dn:8.4f}", flush=True)

        for m in args.top_m:
            if m == 0:
                continue
            report(f"top_m={m}", make_render(m, 8))
        for slv in args.sampler_levels:
            if slv == 8:
                continue
            report(f"sampler_levels={slv}", make_render(56, slv))

    print("\n(vsfull >= ~45 dB means the knob's quadrature error is far "
          "below training noise; vsGT should match the full render's)",
          flush=True)


if __name__ == "__main__":
    main()
