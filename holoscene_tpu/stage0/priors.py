"""Stage-0 prior generation: monocular depth + normal maps for every image.

Reference semantics: marigold/run.py (diffusion depth/normal CLI writing
`depth/*.npy` + `normal/*.png` next to `images/`) and midas/omnidata.py
(DPT normals). The frozen diffusion models are host-side externals here —
providers mirror the Stage-2 pattern:

  * `TorchScriptPriorProvider` — runs TorchScript-exported depth/normal
    estimators (export Marigold / Omnidata / any monodepth net once on a
    torch box; contract: model(image [1,3,H,W] in [0,1]) -> depth [1,1,H,W]
    or normal [1,3,H,W] in [-1,1]). torch imported lazily.
  * `CachedPriorProvider` — replays depth/normal artifacts recorded by a
    previous (possibly GPU) run from a cache directory.

The on-disk output format matches what NSDataset consumes
(datasets/ns_dataset.py:139-205): float32 `.npy` depth, `[0,1]`-mapped
normal PNGs, ordered like `images/`.
"""

from __future__ import annotations

import abc
import os
import shutil

import numpy as np


class PriorProvider(abc.ABC):
    @abc.abstractmethod
    def infer_depth(self, image: np.ndarray) -> np.ndarray:
        """image [H,W,3] float [0,1] -> depth [H,W] float32."""

    @abc.abstractmethod
    def infer_normal(self, image: np.ndarray) -> np.ndarray:
        """image [H,W,3] float [0,1] -> camera-frame unit normals [H,W,3]."""


class TorchScriptPriorProvider(PriorProvider):
    def __init__(self, depth_checkpoint: str | None = None,
                 normal_checkpoint: str | None = None,
                 device: str = "cpu"):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("TorchScriptPriorProvider needs torch") from e
        self._torch = torch
        self.device = device
        self.depth_model = None
        self.normal_model = None
        if depth_checkpoint:
            self.depth_model = torch.jit.load(depth_checkpoint,
                                              map_location=device).eval()
        if normal_checkpoint:
            self.normal_model = torch.jit.load(normal_checkpoint,
                                               map_location=device).eval()

    def _run(self, model, image: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            t = torch.from_numpy(
                np.ascontiguousarray(image, dtype=np.float32)
            ).permute(2, 0, 1)[None].to(self.device)
            out = model(t)
            return out[0].permute(1, 2, 0).cpu().numpy()

    def infer_depth(self, image):
        assert self.depth_model is not None, "no depth checkpoint loaded"
        d = self._run(self.depth_model, image)
        return d[..., 0].astype(np.float32)

    def infer_normal(self, image):
        assert self.normal_model is not None, "no normal checkpoint loaded"
        n = self._run(self.normal_model, image).astype(np.float32)
        return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


class CachedPriorProvider(PriorProvider):
    """Replays priors recorded under cache_dir/{depth,normal}."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        self._i = 0

    def infer_depth(self, image):
        raise NotImplementedError("cached provider copies files directly")

    def infer_normal(self, image):
        raise NotImplementedError("cached provider copies files directly")


def generate_priors(
    scene_dir: str,
    provider: PriorProvider | None = None,
    cache_dir: str | None = None,
    overwrite: bool = False,
) -> tuple[list[str], list[str]]:
    """Write depth/*.npy + normal/*.png for every images/*.png in scene_dir
    (the reference marigold/run.py artifact contract). Either a live
    provider or a cache_dir of recorded priors must be given."""
    from PIL import Image

    img_dir = os.path.join(scene_dir, "images")
    names = sorted(os.listdir(img_dir))
    depth_dir = os.path.join(scene_dir, "depth")
    normal_dir = os.path.join(scene_dir, "normal")
    os.makedirs(depth_dir, exist_ok=True)
    os.makedirs(normal_dir, exist_ok=True)

    depth_paths, normal_paths = [], []
    for name in names:
        stem = os.path.splitext(name)[0]
        dp = os.path.join(depth_dir, stem + ".npy")
        npth = os.path.join(normal_dir, stem + ".png")
        if not overwrite and os.path.exists(dp) and os.path.exists(npth):
            depth_paths.append(dp)
            normal_paths.append(npth)
            continue
        if cache_dir is not None:
            shutil.copy(os.path.join(cache_dir, "depth", stem + ".npy"), dp)
            shutil.copy(os.path.join(cache_dir, "normal", stem + ".png"),
                        npth)
        else:
            assert provider is not None, "need a provider or cache_dir"
            img = np.asarray(
                Image.open(os.path.join(img_dir, name)).convert("RGB"),
                dtype=np.float32,
            ) / 255.0
            depth = provider.infer_depth(img)
            normal = provider.infer_normal(img)
            np.save(dp, depth.astype(np.float32))
            n01 = np.clip((normal + 1.0) * 0.5, 0.0, 1.0)
            Image.fromarray(
                (n01 * 255).astype(np.uint8)
            ).save(npth)
        depth_paths.append(dp)
        normal_paths.append(npth)
    return depth_paths, normal_paths


def main(argv=None):
    """Stage-0 CLI (reference: python marigold/run.py --input_dir ...).

    Usage:
      python -m holoscene_tpu.stage0.priors --scene_dir data/scene_0 \
          [--depth_checkpoint depth.pt --normal_checkpoint normal.pt] \
          [--cache_dir recorded_priors/] [--overwrite]
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--depth_checkpoint", default=None)
    ap.add_argument("--normal_checkpoint", default=None)
    ap.add_argument("--cache_dir", default=None)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    provider = None
    if args.cache_dir is None:
        assert args.depth_checkpoint or args.normal_checkpoint, (
            "give TorchScript checkpoints (--depth_checkpoint / "
            "--normal_checkpoint) or --cache_dir with recorded priors"
        )
        provider = TorchScriptPriorProvider(
            args.depth_checkpoint, args.normal_checkpoint, args.device
        )
    d, n = generate_priors(
        args.scene_dir, provider=provider, cache_dir=args.cache_dir,
        overwrite=args.overwrite,
    )
    print(f"wrote {len(d)} depth + {len(n)} normal priors under "
          f"{args.scene_dir}")


if __name__ == "__main__":
    main()
