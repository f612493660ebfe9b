"""Standalone multiview-prediction driver — the analog of the reference's
top-level `run_mv_prediction.py` (:316-808): precompute per-object novel
views OFF the training loop and write them as vis_info caches that
`CachedArtifactNovelViewProvider` (and Stage-2 via HOLOSCENE_VIEW_CACHE)
replays later.

    python -m holoscene_tpu.stage2.mv_predict --conf confs/replica_room0_post.conf \
        [--timestamp latest] [--out <rundir>/plots/mv_cache] [--seeds 42 3 7]

The novel-view backend is whatever provider is attached (reference: the
Wonder3D+ diffusion pipeline; here: a recorded cache, a user-plugged
NovelViewProvider, or the model-render fallback). The front image is
passed through the super-resolution provider first when one is attached
(reference wonder3d_generation upsampler_func, run_mv_prediction.py:702).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    import holoscene_tpu

    holoscene_tpu.setup_compile_cache()
    from holoscene_tpu.config import ConfigFactory
    from holoscene_tpu.datasets.ns_dataset import NSDataset
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import HoloSceneConfig, init_holoscene
    from holoscene_tpu.stage2.providers import save_vis_info
    from holoscene_tpu.stage2.refine import FinetuneConfig
    from holoscene_tpu.stage2.runner import Stage2Runner
    from holoscene_tpu.training import checkpoints as ckpt_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--exps_folder", default="exps")
    ap.add_argument("--timestamp", default="latest")
    ap.add_argument("--checkpoint", default="latest")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--mesh_resolution", type=int, default=64)
    ap.add_argument("--out", default=None,
                    help="cache dir (default <rundir>/plots/mv_cache)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 3, 7])
    ap.add_argument("--objects", type=int, nargs="*", default=None)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

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
        if args.timestamp == "latest" else args.timestamp
    )
    assert timestamp, f"no Stage-1 run under {expdir}"
    rundir = os.path.join(expdir, timestamp)

    model_cfg = HoloSceneConfig.from_conf(conf.get_config("model"))
    params = init_holoscene(jax.random.PRNGKey(0), model_cfg)
    params, _, meta = ckpt_lib.load_checkpoint(
        os.path.join(rundir, "checkpoints"), params, None, args.checkpoint
    )
    print(f"[mv_predict] checkpoint step={meta.get('step', '?')}")

    runner = Stage2Runner(
        params, model_cfg, dataset,
        out_dir=os.path.join(rundir, "plots"),
        loss_cfg=LossConfig.from_conf(conf.get_config("loss")),
        finetune_cfg=FinetuneConfig.from_conf(conf),
        mesh_resolution=args.mesh_resolution,
        quiet=args.quiet,
    )
    runner.seeds = list(args.seeds)

    out_dir = args.out or os.path.join(rundir, "plots", "mv_cache")
    os.makedirs(out_dir, exist_ok=True)

    meshes = runner.extract_meshes()
    obj_ids = args.objects or [
        i for i in range(1, len(meshes)) if meshes[i] is not None
    ]
    written = []
    for obj_i in obj_ids:
        mesh = meshes[obj_i]
        if mesh is None:
            continue
        b = mesh.bounds
        half_extent = float(np.linalg.norm(b[1] - b[0]) / 2 * 1.3)
        packs = runner.generate_novel_views(obj_i, mesh, half_extent)
        if not packs:
            print(f"[mv_predict] obj {obj_i}: provider returned no views")
            continue
        path = os.path.join(out_dir, f"vis_info_{obj_i}.pkl")
        save_vis_info(path, packs)
        written.append(path)
        if not args.quiet:
            print(f"[mv_predict] obj {obj_i}: {len(packs)} views -> {path}")

    print(f"[mv_predict] wrote {len(written)} caches to {out_dir} "
          f"(replay via HOLOSCENE_VIEW_CACHE={out_dir})")
    return written


if __name__ == "__main__":
    main()
