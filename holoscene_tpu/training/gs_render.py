"""Standalone Gaussian renderer CLI (reference threedgrut/render.py).

Loads a 3DGS checkpoint PLY and a dataset, renders the chosen split through
the tile splat renderer, writes PNGs and a metrics JSON.

Usage:
  python -m holoscene_tpu.training.gs_render --ply scene.ply \
      --dataset nerf --data_root path/to/lego [--split test] [--out out/]

--renderer trace switches to the gaussian ray tracer (ops/gs_trace.py, the
3DGRT analog; reference threedgrt_tracer/tracer.py), and --camera fisheye
renders through the equidistant fisheye model only the tracer supports.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def render_views(g: dict, poses, intrinsics, img_res, sh_degree: int = 3,
                 max_per_tile: int = 0, camera_model: str = "pinhole",
                 dist: tuple | None = None, intrinsics_all=None):
    """Render [N,4,4] c2w poses; yields [H,W,3] images. camera_model
    opencv/fisheye routes projection through the unscented transform
    (ops/gaussians.project_gaussians_ut, the 3DGUT path). intrinsics_all
    [N,3,3] renders each view with its own camera matrix (heterogeneous
    COLMAP reconstructions)."""
    from holoscene_tpu.ops.splat import (
        auto_max_per_tile,
        calibrate_max_per_tile,
        render_gaussians,
        tile_overlap_counts,
    )

    h, w = img_res
    means = jnp.asarray(g["means"])
    quats = jnp.asarray(g["quats"])
    scales = jnp.exp(jnp.asarray(g["log_scales"]))
    opac = jax.nn.sigmoid(jnp.asarray(g["opacity_logits"]).reshape(-1))
    # SH layout: [N, B, 3] with DC first
    rest = np.asarray(g["features_rest"])
    sh = np.concatenate([np.asarray(g["features_dc"])[:, None, :], rest],
                        axis=1)
    sh_j = jnp.asarray(sh)
    intr = jnp.asarray(intrinsics)

    if max_per_tile <= 0:
        vm0 = jnp.linalg.inv(jnp.asarray(poses[0]))
        counts = tile_overlap_counts(means, quats, scales, vm0, intr, w, h)
        k_geom = auto_max_per_tile(np.asarray(counts))
        max_per_tile = calibrate_max_per_tile(
            lambda k: render_gaussians(
                means, quats, scales, opac, sh_j, vm0, intr, width=w,
                height=h, max_per_tile=int(k), sh_degree=sh_degree,
                camera_model=camera_model, dist=dist,
            )["rgb"],
            hi=k_geom,
        )

    for vi, pose in enumerate(poses):
        viewmat = jnp.linalg.inv(jnp.asarray(pose))
        k = (intr if intrinsics_all is None
             else jnp.asarray(intrinsics_all[vi]))
        out = render_gaussians(
            means, quats, scales, opac, sh_j, viewmat, k,
            width=w, height=h, max_per_tile=max_per_tile,
            sh_degree=sh_degree,
            background=jnp.ones(3),
            camera_model=camera_model, dist=dist,
        )
        yield np.asarray(out["rgb"])


def main(argv=None):
    from PIL import Image

    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    from holoscene_tpu.models.gom import read_gaussian_ply
    from holoscene_tpu.utils.eval_rgb import eval_rgb

    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--dataset", choices=["nerf", "colmap", "ns"],
                    default="nerf")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default="renders")
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--max_per_tile", type=int, default=0,
                    help="0 = auto from p99 tile overlap")
    ap.add_argument("--max_num_images", type=int, default=-1)
    ap.add_argument("--renderer", choices=["raster", "trace"],
                    default="raster")
    ap.add_argument("--camera", choices=["pinhole", "opencv", "fisheye"],
                    default="pinhole",
                    help="raster routes non-pinhole models through the "
                         "unscented-transform projection (3DGUT); trace "
                         "supports pinhole + fisheye ray generation")
    ap.add_argument("--dist", type=float, nargs="*", default=None,
                    help="distortion coeffs: opencv k1 k2 p1 p2 [k3]; "
                         "fisheye k1 k2 k3 k4")
    ap.add_argument("--max_hits", type=int, default=128,
                    help="tracer hits per ray")
    args = ap.parse_args(argv)
    if args.camera == "opencv" and args.renderer == "trace":
        ap.error("--camera opencv is raster-only (trace supports fisheye)")
    auto_camera = args.camera == "pinhole" and args.dist is None

    if args.dataset == "nerf":
        from holoscene_tpu.datasets.gs_datasets import NerfSyntheticDataset

        ds = NerfSyntheticDataset(args.data_root, split="train",
                                  max_num_images=args.max_num_images)
    elif args.dataset == "colmap":
        from holoscene_tpu.datasets.gs_datasets import ColmapDataset

        ds = ColmapDataset(args.data_root,
                           max_num_images=args.max_num_images)
    else:
        from holoscene_tpu.datasets.ns_dataset import NSDataset

        root, name = os.path.split(os.path.normpath(args.data_root))
        ds = NSDataset(root, name)

    if args.split == "test" and getattr(ds, "test", None):
        poses = ds.test["pose_all"]
        gts = ds.test["rgb_images"]
        intr_all = ds.test.get("intrinsics_all") \
            if isinstance(ds.test, dict) else None
    else:
        poses = ds.pose_all
        gts = ds.rgb_images
        intr_all = getattr(ds, "intrinsics_all", None)
    # heterogeneous per-view intrinsics only matter when they differ
    if intr_all is not None and np.allclose(intr_all, intr_all[0], rtol=1e-6):
        intr_all = None

    g = read_gaussian_ply(args.ply)
    os.makedirs(args.out, exist_ok=True)
    h, w = ds.img_res

    if args.renderer == "trace":
        if getattr(ds, "camera_model", "pinhole") != "pinhole":
            import warnings

            warnings.warn(
                f"dataset carries a {ds.camera_model} distortion model the "
                "trace renderer does not apply (trace supports pinhole + "
                "coefficient-free equidistant fisheye ray generation) — "
                "metrics vs the distorted GT will be depressed; use "
                "--renderer raster for UT-projected distortion"
            )
        from holoscene_tpu.ops.gs_trace import trace_image

        def _images():
            for pose in poses:
                yield trace_image(
                    g, pose, ds.intrinsics[:3, :3], w, h,
                    sh_degree=args.sh_degree, camera=args.camera,
                    max_hits=args.max_hits,
                )["rgb"]

        images = _images()
    else:
        camera, dist = args.camera, tuple(args.dist) if args.dist else None
        if auto_camera and getattr(ds, "camera_model", "pinhole") != "pinhole":
            # COLMAP reconstructions carry their distortion model — adopt it
            camera, dist = ds.camera_model, ds.dist
            print(f"[gs_render] dataset camera: {camera} dist={dist}")
        images = render_views(
            g, poses, ds.intrinsics[:3, :3], ds.img_res,
            args.sh_degree, args.max_per_tile,
            camera_model=camera, dist=dist, intrinsics_all=intr_all,
        )
    metrics = []
    for i, img in enumerate(images):
        Image.fromarray(
            np.clip(img * 255, 0, 255).astype(np.uint8)
        ).save(os.path.join(args.out, f"render_{i:04d}.png"))
        m = eval_rgb(img, np.asarray(gts[i]).reshape(h, w, 3))
        metrics.append(m)
        print(f"[{i}] psnr={m['psnr']:.2f} ssim={m['ssim']:.3f}")
    summary = {
        k: float(np.nanmean([m[k] for m in metrics])) for k in metrics[0]
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump({"per_view": metrics, "mean": summary}, f, indent=2)
    print("mean:", summary)


if __name__ == "__main__":
    main()
