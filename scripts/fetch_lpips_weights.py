"""Assemble the full lpips-alex weight file from the committed linear head
plus the torchvision AlexNet backbone — the one network fetch LPIPS needs.

The LPIPS metric (reference utils/eval_rgb.py:16-27, lpips-alex v0.1) =
AlexNet features + 1x1 linear heads. The linear heads are COMMITTED in this
repo (holoscene_tpu/assets/lpips_alex_lin.npz, 6 KB, the published BSD-2
lpips v0.1 weights — the reference vendors the identical file at
lama/models/lpips_models/alex.pth). The AlexNet backbone (~9 MB) is the
standard torchvision checkpoint and is NOT committed; this script fetches
and converts it:

    python scripts/fetch_lpips_weights.py            # downloads + writes
    python scripts/fetch_lpips_weights.py --backbone alexnet-owt.pth
    # offline: point --backbone at a pre-downloaded torchvision file

Output: ~/.cache/holoscene/lpips_alex.npz (override with --out), the file
utils/lpips_jax.lpips_from_npz resolves by default — after one run of this
script, every eval table prints real LPIPS. On a zero-egress box with no
local backbone file, it exits 2 with a clear message (evals fall back to
printing NaN for LPIPS, never crash).
"""

from __future__ import annotations

import argparse
import io
import os
import sys

import numpy as np

ALEXNET_URL = "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth"
# torchvision AlexNet `features` conv indices, in lpips tap order
_FEATURE_KEYS = ("features.0", "features.3", "features.6", "features.8",
                 "features.10")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIN_NPZ = os.path.join(_REPO, "holoscene_tpu", "assets",
                        "lpips_alex_lin.npz")
_DEFAULT_OUT = os.path.join(
    os.path.expanduser("~"), ".cache", "holoscene", "lpips_alex.npz")


def _load_backbone(path: str | None) -> dict:
    import torch

    if path:
        return torch.load(path, map_location="cpu")
    try:
        from urllib.request import urlopen

        print(f"downloading {ALEXNET_URL} ...", flush=True)
        with urlopen(ALEXNET_URL, timeout=120) as r:
            blob = r.read()
        return torch.load(io.BytesIO(blob), map_location="cpu")
    except OSError as e:
        print(f"ERROR: cannot fetch the AlexNet backbone ({e}).\n"
              f"On an offline box, download {ALEXNET_URL} elsewhere and "
              f"pass it via --backbone.", file=sys.stderr)
        sys.exit(2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default=None,
                    help="local torchvision alexnet .pth (skips download)")
    ap.add_argument("--lin", default=_LIN_NPZ,
                    help="linear-head npz (default: the committed asset)")
    ap.add_argument("--out", default=_DEFAULT_OUT)
    args = ap.parse_args()

    sd = _load_backbone(args.backbone)
    params = {}
    for i, k in enumerate(_FEATURE_KEYS):
        params[f"conv{i}_w"] = sd[f"{k}.weight"].numpy().astype(np.float32)
        params[f"conv{i}_b"] = sd[f"{k}.bias"].numpy().astype(np.float32)
    with np.load(args.lin) as z:
        for i in range(5):
            params[f"lin{i}_w"] = np.asarray(z[f"lin{i}_w"], np.float32)

    # shape-check against the lpips-alex architecture before writing
    sys.path.insert(0, _REPO)
    from holoscene_tpu.utils.lpips_jax import _ALEX_CONVS

    for i, (out_c, in_c, ksz, _s, _p, _mp) in enumerate(_ALEX_CONVS):
        assert params[f"conv{i}_w"].shape == (out_c, in_c, ksz, ksz), (
            i, params[f"conv{i}_w"].shape)
        assert params[f"lin{i}_w"].shape == (out_c,), i

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **params)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB) — "
          f"utils/eval_rgb.lpips_fn now resolves real LPIPS")


if __name__ == "__main__":
    main()
