"""Export lpips-alex weights to an npz consumable by utils/lpips_jax.py.

Run this ONCE in any environment where the torch `lpips` package and its
pretrained AlexNet weights are available (they download on first use):

    pip install lpips torch
    python scripts/export_lpips_npz.py --out lpips_alex.npz

then point the hermetic environment at the file:

    export HOLOSCENE_LPIPS_NPZ=/path/to/lpips_alex.npz
    # or copy it to ~/.cache/holoscene/lpips_alex.npz (the default path)

`--random SEED` exports a random-weight parameter set with the exact
lpips-alex shapes instead (no lpips/torchvision needed) — used by the
conversion-parity test, NOT a perceptual metric.

Key layout (see utils/lpips_jax._ALEX_CONVS):
    conv{0..4}_w [out, in, kh, kw], conv{0..4}_b [out]  — AlexNet features
    lin{0..4}_w  [out]                                   — LPIPS 1x1 weights
"""

from __future__ import annotations

import argparse

import numpy as np


def export_from_lpips(out_path: str) -> None:
    import lpips as lpips_pkg  # noqa: F401
    import torch

    net = lpips_pkg.LPIPS(net="alex", verbose=False)
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 5, len(conv_layers)
    params = {}
    for i, c in enumerate(conv_layers):
        params[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        params[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        params[f"lin{i}_w"] = w.reshape(-1).astype(np.float32)
    np.savez(out_path, **params)
    print(f"wrote {out_path}: " + ", ".join(sorted(params)))


def export_random(out_path: str, seed: int) -> None:
    from holoscene_tpu.utils.lpips_jax import init_random_params

    np.savez(out_path, **init_random_params(seed))
    print(f"wrote RANDOM-weight {out_path} (conversion testing only)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--random", type=int, default=None, metavar="SEED")
    args = ap.parse_args()
    if args.random is not None:
        export_random(args.out, args.random)
    else:
        export_from_lpips(args.out)


if __name__ == "__main__":
    main()
