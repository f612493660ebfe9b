"""Standalone evaluation CLI (reference: utils/eval_rgb.py + eval_geometry.py
invoked as scripts).

Usage:
  # novel-view metrics for rendered-vs-GT image directories
  python scripts/eval.py rgb --pred renders/ --gt data/scene_0/images/

  # chamfer accuracy/completion/completion-ratio between meshes
  python scripts/eval.py geometry --rec rec.ply --gt gt.ply [--no-align]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from holoscene_tpu.utils.eval_geometry import calc_3d_metric  # noqa: E402
from holoscene_tpu.utils.eval_rgb import eval_rgb  # noqa: E402
from holoscene_tpu.utils.mesh import read_obj, read_ply  # noqa: E402


def _load_mesh(path):
    return read_obj(path) if path.endswith(".obj") else read_ply(path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_rgb = sub.add_parser("rgb")
    p_rgb.add_argument("--pred", required=True)
    p_rgb.add_argument("--gt", required=True)

    p_geo = sub.add_parser("geometry")
    p_geo.add_argument("--rec", required=True)
    p_geo.add_argument("--gt", required=True)
    p_geo.add_argument("--dist_th", type=float, default=0.05)
    p_geo.add_argument("--n_samples", type=int, default=200000)
    p_geo.add_argument("--no-align", action="store_true")
    args = parser.parse_args(argv)

    if args.cmd == "rgb":
        preds = sorted(os.listdir(args.pred))
        gts = sorted(os.listdir(args.gt))
        metrics = []
        for p, g in zip(preds, gts):
            a = np.asarray(Image.open(os.path.join(args.pred, p)),
                           dtype=np.float32) / 255.0
            b = np.asarray(Image.open(os.path.join(args.gt, g)),
                           dtype=np.float32) / 255.0
            metrics.append(eval_rgb(a[..., :3], b[..., :3]))
        out = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
        out["n_images"] = len(metrics)
    else:
        out = calc_3d_metric(
            _load_mesh(args.rec), _load_mesh(args.gt),
            n_samples=args.n_samples, dist_th=args.dist_th,
            align=not args.no_align,
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
