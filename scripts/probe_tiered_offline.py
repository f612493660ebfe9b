"""Offline (CPU) error probe for a PROSPECTIVE lever: tiered fine levels.

Among the top-M render points (already ranked by estimated compositing
weight), only the top F get all 16 hash levels; the tail M-F get the
8 coarse levels with zero-padded fine features (the sampler's own
approximation, applied to low-weight render points). Gather-row saving
at F of M: rows ∝ F*16 + (M-F)*8 vs M*16.

This probe measures the resulting RGB/depth/normal error on the trained
flagship checkpoint BEFORE any fused-path implementation — same
methodology as probe_prune_offline.py (identical rays + sampler RNG vs
the untiered render).

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_tiered_offline.py \
      --work /tmp/tpu_flagship512_sampled [--rays 2048] [--frames 0 5]
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
from holoscene_tpu.models.fields import (
    _implicit_mlp,
    _plain_linear_apply,
    rendering_forward,
    semantic_from_sdf,
)
from holoscene_tpu.models.holoscene import get_beta, scene_sdf_nograd
from holoscene_tpu.ops.density import laplace_density
from holoscene_tpu.ops.hashgrid import HashGridMeta, hash_encode
from holoscene_tpu.ops.sampler import (
    error_bound_sample,
    estimate_weights_from_buffer,
)
from holoscene_tpu.ops.volrend import (
    composite,
    composite_depth,
    volume_render_weights,
)
from holoscene_tpu.training.stage1 import Stage1Runner, rays_from_batch

def coarse_meta(meta: HashGridMeta, levels: int) -> HashGridMeta:
    # keep the FULL grid's per-level scale (fields.py implicit_forward)
    return HashGridMeta(
        input_dim=meta.input_dim, num_levels=levels,
        level_dim=meta.level_dim, base_resolution=meta.base_resolution,
        log2_hashmap_size=meta.log2_hashmap_size,
        per_level_scale=meta.per_level_scale, desired_resolution=None,
    )


def make_render(cfg, fine_f: int, coarse_levels: int = 8, top_m: int = 56,
                tail_interp: str = "trilinear"):
    """Training-mode render with per-point tiered encode; fine_f == TOP_M
    reproduces the untiered fused-path math (exact reference variant).
    tail_interp="tetrahedral" additionally encodes the tail tier with the
    4-corner Kuhn-simplex stencil (half the gather rows again)."""
    icfg = cfg.implicit
    meta = icfg.grid_meta
    TOP_M = top_m
    meta_c = coarse_meta(meta, coarse_levels)
    grid_dim = icfg.num_levels * icfg.level_dim

    @jax.jit
    def render(params, uv, pose, intr):
        rays_o, rays_d, dscale, w2c = rays_from_batch(uv, pose, intr)
        R = rays_o.shape[0]
        key = jax.random.PRNGKey(7)
        z_vals, _, (z_buf, sdf_buf, beta_buf) = error_bound_sample(
            key, rays_o, rays_d, scene_sdf_nograd(params, cfg),
            jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
            training=True, return_aux=True,
        )
        est_w = estimate_weights_from_buffer(z_vals, z_buf, sdf_buf, beta_buf)
        score = est_w.at[:, 0].set(jnp.inf).at[:, -1].set(jnp.inf)
        _, keep = jax.lax.top_k(score, TOP_M)
        keep = jnp.sort(keep, axis=-1)
        z_vals = jnp.take_along_axis(z_vals, keep, axis=-1)
        kept_w = jnp.take_along_axis(score, keep, axis=-1)

        # fine tier: top-F of the kept set by estimated weight
        fine_rank = jnp.argsort(
            jnp.argsort(-kept_w, axis=-1), axis=-1
        )                                                  # rank 0 = heaviest
        fine_mask = (fine_rank < fine_f).reshape(-1)       # [R*M]

        points = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
        pts = points.reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], points.shape).reshape(-1, 3)

        ip = params["implicit"]

        def encode_mixed(p3):
            xn = p3 / icfg.divide_factor
            x01 = (xn + 1.0) * 0.5
            fa = hash_encode(x01, ip["grid"], meta, packed=True)
            cf = hash_encode(x01, ip["color_grid"], meta, packed=True)
            fa_c = hash_encode(x01, ip["grid"], meta_c, packed=True,
                               interp=tail_interp)
            cf_c = hash_encode(x01, ip["color_grid"], meta_c, packed=True,
                               interp=tail_interp)
            pad = jnp.zeros(p3.shape[:-1] + (grid_dim - fa_c.shape[-1],))
            fa_c = jnp.concatenate([fa_c, pad], axis=-1)
            cf_c = jnp.concatenate([cf_c, pad], axis=-1)
            m = fine_mask[:, None]
            return jnp.where(m, fa, fa_c), jnp.where(m, cf, cf_c)

        def sdf_of(p3):
            fa, cf = encode_mixed(p3)
            raw = _implicit_mlp(ip, icfg, p3, fa)
            return raw, cf

        (sdf_raw, cf), pullback = jax.vjp(sdf_of, pts)
        sdf = sdf_raw.min(axis=-1)
        eq = (sdf_raw == sdf[:, None]).astype(sdf_raw.dtype)
        ct = eq / eq.sum(axis=-1, keepdims=True)
        (gradients,) = pullback((ct, jnp.zeros_like(cf)))

        cf = _plain_linear_apply(ip["color_map_mlp"]["lin0"], cf)
        cf = jax.nn.relu(cf)
        fv = _plain_linear_apply(ip["color_map_mlp"]["lin1"], cf)
        rgb_flat = rendering_forward(params["rendering"], cfg.rendering,
                                     pts, gradients, dirs, fv)

        beta = get_beta(params, cfg)
        density = laplace_density(sdf.reshape(R, TOP_M), beta)
        weights, _, _ = volume_render_weights(z_vals, density)
        rgb = composite(weights, rgb_flat.reshape(R, TOP_M, 3))
        depth = dscale * composite_depth(weights, z_vals)
        normals = gradients / jnp.sqrt(
            (gradients * gradients).sum(-1, keepdims=True) + 1e-12
        )
        nmap = composite(weights, normals.reshape(R, TOP_M, 3)) @ w2c.T
        return rgb, depth, nmap

    return render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/tpu_flagship512_sampled")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--frames", type=int, nargs="+", default=[0, 5])
    ap.add_argument("--fine_f", type=int, nargs="+", default=[48, 40, 32, 24])
    ap.add_argument("--coarse", type=int, default=8)
    ap.add_argument("--top_m", type=int, default=56)
    ap.add_argument("--tail_interp", default="trilinear",
                    choices=["trilinear", "tetrahedral"])
    ap.add_argument("--sampler_iters", type=int, default=0,
                    help="override sampler.max_total_iters (upsample "
                         "rounds); reference default 5. The variant renders "
                         "use this, the reference render keeps the default, "
                         "so the delta isolates sample-PLACEMENT error.")
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
    cfg = dataclasses.replace(
        runner.model_cfg, use_bg_reg=False, sampler_grid_levels=8,
        implicit=dataclasses.replace(runner.model_cfg.implicit,
                                     fused_dual_grid=True),
    )

    rng = np.random.default_rng(0)
    h, w = runner.dataset.img_res
    for frame in args.frames:
        sample, gt = runner.dataset.full_frame(frame)
        pick = rng.choice(h * w, size=args.rays, replace=False)
        uv = jnp.asarray(np.asarray(sample["uv"])[pick])
        pose, intr = sample["pose"], sample["intrinsics"]
        gt_rgb = np.asarray(gt["rgb"])[pick]

        TOP_M = args.top_m
        ref = jax.tree_util.tree_map(
            np.asarray,
            make_render(cfg, TOP_M, top_m=TOP_M)(runner.params, uv, pose,
                                                 intr),
        )
        ref_psnr = -10 * np.log10(np.mean((ref[0] - gt_rgb) ** 2) + 1e-12)
        rows_full = TOP_M * 16
        print(f"\nframe {frame}: untiered top-{TOP_M} coarse={args.coarse} "
              f"vs GT psnr {ref_psnr:.2f}", flush=True)
        print(f"{'variant':22s} {'rows%':>6s} {'vsfull(dB)':>10s} "
              f"{'vsGT(dB)':>9s} {'depth|d|':>9s} {'norm|d|':>8s}",
              flush=True)
        corner_frac = 0.5 if args.tail_interp == "tetrahedral" else 1.0
        var_cfg = cfg
        if args.sampler_iters:
            var_cfg = dataclasses.replace(
                cfg, sampler=dataclasses.replace(
                    cfg.sampler, max_total_iters=args.sampler_iters
                ),
            )
        for f in args.fine_f:
            out = jax.tree_util.tree_map(
                np.asarray,
                make_render(var_cfg, f, coarse_levels=args.coarse,
                            top_m=TOP_M, tail_interp=args.tail_interp)(
                    runner.params, uv, pose, intr),
            )
            vs_full = -10 * np.log10(np.mean((out[0] - ref[0]) ** 2) + 1e-12)
            vs_gt = -10 * np.log10(np.mean((out[0] - gt_rgb) ** 2) + 1e-12)
            rows = (f * 16 + (TOP_M - f) * args.coarse * corner_frac) \
                / rows_full * 100
            print(f"fine_f={f:<15d} {rows:6.0f} {vs_full:10.2f} {vs_gt:9.2f} "
                  f"{np.abs(out[1] - ref[1]).mean():9.4f} "
                  f"{np.abs(out[2] - ref[2]).mean():8.4f}", flush=True)


if __name__ == "__main__":
    main()
