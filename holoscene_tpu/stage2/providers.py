"""Provider interfaces for the Stage-2 frozen generative models.

The reference loads five large pretrained networks (SURVEY.md §2 #13-#17):
Wonder3D+ multiview diffusion (run_mv_prediction.py:316-808), LaMa
inpainting (lama/utils.py:18-38), Marigold depth/normal diffusion
(marigold/run.py), Omnidata DPT normals (midas/omnidata.py:7-21), and
Real-ESRGAN x4 SR (upsample/). They are inference-only priors whose
checkpoints are not distributable with this framework, so the TPU pipeline
talks to them through provider interfaces:

  * TorchHub-style providers attach automatically when the packages +
    checkpoints exist (plug points documented per provider);
  * `CachedArtifactProvider` replays outputs recorded to disk (the
    vis_info_{i}.pkl / bg_info.pkl artifact convention the reference also
    uses for cross-stage hand-off);
  * `Null*` fallbacks keep the pipeline runnable end-to-end without any
    checkpoints: inpainting returns a masked-mean fill, novel-view synthesis
    returns the SDF model's own renders from the requested poses (no
    hallucination), normal estimation derives normals from depth gradients.

This mirrors SURVEY.md §7 step 6: "LaMa/Wonder3D/Omnidata/ESRGAN remain
host-side external models ... behind a provider interface with cached
outputs so the TPU pipeline is testable without them".
"""

from __future__ import annotations

import abc
import os
import pickle

import numpy as np


# ---------------------------------------------------------------------------
# inpainting (LaMa counterpart)
# ---------------------------------------------------------------------------


class InpaintProvider(abc.ABC):
    @abc.abstractmethod
    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """image [H,W,C] float [0,1]; mask [H,W] bool (True = fill).
        Returns [H,W,C]."""


class NullInpaintProvider(InpaintProvider):
    """Diffusion-free fill: iterative neighborhood averaging from the known
    region inward (usable stand-in for LaMa on the depth/normal/rgb renders
    the reference inpaints, holoscene_train_post.py:1013-1080)."""

    def __init__(self, iterations: int = 256):
        self.iterations = iterations

    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        img = image.copy().astype(np.float64)
        known = ~mask
        if known.sum() == 0:
            return img
        img[mask] = 0.0
        weight = known.astype(np.float64)
        for _ in range(self.iterations):
            if weight[mask].min() > 0:
                break
            # 4-neighborhood diffusion
            acc = np.zeros_like(img)
            wacc = np.zeros_like(weight)
            for shift, axis in (((1), 0), ((-1), 0), ((1), 1), ((-1), 1)):
                acc += np.roll(img, shift, axis=axis)
                wacc += np.roll(weight, shift, axis=axis)
            fill = wacc > 0
            upd = mask & fill & (weight == 0)
            img[upd] = (acc[upd] / np.maximum(wacc[upd], 1e-12)[..., None]
                        if img.ndim == 3 else acc[upd] / np.maximum(wacc[upd], 1e-12))
            weight[upd] = 1.0
        # anything still unknown: global mean
        still = mask & (weight == 0)
        if still.any():
            img[still] = image[known].mean(axis=0)
        return img


class TorchLamaProvider(InpaintProvider):
    """Real LaMa inpainting through a torch checkpoint (reference
    lama/utils.py:18-56 load_model/inpaint semantics, CPU or GPU).

    Accepts either
      * a TorchScript archive (the widely distributed `big-lama.pt` JIT
        export): called as model(image [1,3,H,W], mask [1,1,H,W]) ->
        [1,3,H,W] in [0,1]; or
      * the reference checkpoint directory layout (config.yaml +
        models/<ckpt>), which needs the saicinpainting package — imported
        lazily and only if present.

    torch is imported lazily; constructing this provider without torch or
    without a checkpoint raises with a clear message (no silent fallback —
    callers choose NullInpaintProvider explicitly). Inputs are padded to
    the FFC stride (multiple of 8) and unpadded after.
    """

    def __init__(self, checkpoint: str, device: str = "cpu"):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "TorchLamaProvider needs torch; use NullInpaintProvider "
                "or CachedArtifact* providers without it"
            ) from e
        self._torch = torch
        self.device = device
        self._kind = None
        if os.path.isfile(checkpoint):
            self.model = torch.jit.load(checkpoint, map_location=device)
            self.model.eval()
            self._kind = "jit"
        elif os.path.isdir(checkpoint):
            self.model = self._load_trainer_checkpoint(checkpoint, device)
            self._kind = "module"
        else:
            raise FileNotFoundError(f"no LaMa checkpoint at {checkpoint}")

    @staticmethod
    def _load_trainer_checkpoint(ckpt_dir: str, device: str):
        """Reference directory layout (lama/utils.py:18-36). Needs the
        saicinpainting package on the path."""
        try:
            import yaml
            from omegaconf import OmegaConf
            from saicinpainting.training.trainers import load_checkpoint
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "directory-style LaMa checkpoints need the saicinpainting "
                "package; export the model to TorchScript instead"
            ) from e
        with open(os.path.join(ckpt_dir, "config.yaml")) as f:
            train_config = OmegaConf.create(yaml.safe_load(f))
        train_config.training_model.predict_only = True
        train_config.visualizer.kind = "noop"
        import glob

        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "models", "*.ckpt")))
        model = load_checkpoint(
            train_config, ckpts[-1], strict=False, map_location="cpu"
        )
        model.freeze()
        return model.to(device)

    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        torch = self._torch
        img = np.asarray(image, dtype=np.float32)
        squeeze = img.ndim == 3 and img.shape[-1] == 1
        if img.ndim == 2:
            img = img[..., None]
            squeeze = True
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        h, w = img.shape[:2]
        ph, pw = (-h) % 8, (-w) % 8
        img_p = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        mask_p = np.pad(
            mask.astype(np.float32), ((0, ph), (0, pw)), mode="edge"
        )
        with torch.no_grad():
            t_img = (
                torch.from_numpy(img_p).permute(2, 0, 1)[None].to(self.device)
            )
            t_mask = torch.from_numpy(mask_p)[None, None].to(self.device)
            if self._kind == "jit":
                out = self.model(t_img, t_mask)
            else:
                batch = {"image": t_img, "mask": t_mask}
                out = self.model(batch)["inpainted"]
            res = out[0].permute(1, 2, 0).cpu().numpy()[:h, :w]
        if squeeze:
            res = res.mean(axis=-1, keepdims=True)
        # only the masked region is replaced (reference composites likewise);
        # the squeeze/repeat normalization above guarantees res's channel
        # count matches the caller's image
        keep = ~mask.astype(bool)
        out_img = np.asarray(image, dtype=np.float32).copy()
        out_img_flat = out_img.reshape(h, w, -1)
        out_img_flat[~keep] = res[~keep]
        return out_img_flat.reshape(np.asarray(image).shape)


# ---------------------------------------------------------------------------
# novel-view synthesis (Wonder3D+ counterpart)
# ---------------------------------------------------------------------------


class NovelViewProvider(abc.ABC):
    @abc.abstractmethod
    def generate_views(
        self,
        front_rgb: np.ndarray,
        front_mask: np.ndarray,
        poses: list[np.ndarray],
        seed: int = 42,
        obj_i: int | None = None,
    ) -> list[dict]:
        """Returns per-pose dicts {rgb [H,W,3], normal [H,W,3] (camera
        frame), mask [H,W]} (the Wonder3D+ output contract,
        run_mv_prediction.py:702-808). `obj_i` identifies the object for
        providers replaying per-object artifacts."""


class ModelRenderNovelViewProvider(NovelViewProvider):
    """Fallback: 'novel views' are the current SDF model's own renders from
    the requested poses (no hallucination of unseen surfaces, but the same
    artifact shapes flow through the pipeline)."""

    def __init__(self, render_fn):
        """render_fn(pose, seed) -> {rgb, normal, mask} in Wonder3D layout."""
        self.render_fn = render_fn

    def generate_views(self, front_rgb, front_mask, poses, seed: int = 42,
                       obj_i: int | None = None):
        return [self.render_fn(pose, seed) for pose in poses]


# ---------------------------------------------------------------------------
# monocular normals (Omnidata counterpart)
# ---------------------------------------------------------------------------


class NormalEstimator(abc.ABC):
    @abc.abstractmethod
    def infer_normal(self, image: np.ndarray, depth: np.ndarray | None = None
                     ) -> np.ndarray:
        """[H,W,3] camera-frame unit normals in [-1,1]."""


class TorchScriptNormalEstimator(NormalEstimator):
    """Real monocular normal net via a TorchScript checkpoint (export
    Omnidata DPT once on a torch box; reference midas/omnidata.py:7-21).
    Contract: model(image [1,3,H,W] in [0,1]) -> [1,3,H,W] in [-1,1]."""

    def __init__(self, checkpoint: str, device: str = "cpu"):
        from holoscene_tpu.stage0.priors import TorchScriptPriorProvider

        self._p = TorchScriptPriorProvider(
            normal_checkpoint=checkpoint, device=device
        )

    def infer_normal(self, image, depth=None):
        return self._p.infer_normal(np.asarray(image, np.float32))


class DepthGradientNormalEstimator(NormalEstimator):
    """Normals from the depth map's screen-space gradients (the geometric
    core of what the reference re-estimates with Omnidata on inpainted
    renders, midas/omnidata.py:21)."""

    def __init__(self, focal: float = 1.0):
        self.focal = focal

    def infer_normal(self, image, depth=None):
        assert depth is not None, "depth-gradient estimator needs depth"
        dz_dy, dz_dx = np.gradient(depth)
        n = np.stack(
            [-dz_dx * self.focal, -dz_dy * self.focal, -np.ones_like(depth)],
            axis=-1,
        )
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return n


# ---------------------------------------------------------------------------
# super-resolution (Real-ESRGAN counterpart)
# ---------------------------------------------------------------------------


class Upsampler(abc.ABC):
    @abc.abstractmethod
    def upsample(self, image: np.ndarray, scale: int = 4) -> np.ndarray:
        ...


class BicubicUpsampler(Upsampler):
    def upsample(self, image: np.ndarray, scale: int = 4) -> np.ndarray:
        from PIL import Image

        h, w = image.shape[:2]
        im = Image.fromarray(np.clip(image * 255, 0, 255).astype(np.uint8))
        im = im.resize((w * scale, h * scale), Image.BICUBIC)
        return np.asarray(im, dtype=np.float32) / 255.0


class TorchScriptUpsampler(Upsampler):
    """Real super-resolution via a TorchScript checkpoint (export the
    Real-ESRGAN RRDBNet once on a torch box: `torch.jit.trace(model, x)`;
    reference upsample/ pipeline). Contract: model(image [1,3,h,w] float
    in [0,1]) -> [1,3,h*s,w*s] in [0,1] for a fixed integer s.

    Images are processed in overlapping tiles (Real-ESRGAN's own tiling
    strategy) so arbitrarily large renders fit host memory; the overlap
    margin is cropped from every tile's output to hide seam artifacts.
    """

    def __init__(self, checkpoint: str, device: str = "cpu",
                 tile: int = 256, tile_pad: int = 16):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "TorchScriptUpsampler needs torch; use BicubicUpsampler "
                "without it"
            ) from e
        if not os.path.isfile(checkpoint):
            raise FileNotFoundError(
                f"TorchScript SR checkpoint not found: {checkpoint}"
            )
        self._torch = torch
        self.device = device
        self.tile = tile
        self.tile_pad = tile_pad
        self.model = torch.jit.load(checkpoint, map_location=device)
        self.model.eval()
        # probe the model's native scale factor once
        with torch.no_grad():
            probe = torch.zeros(1, 3, 8, 8, device=device)
            self._native_scale = self.model(probe).shape[-1] // 8

    def _run_tile(self, chw: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            t = torch.from_numpy(chw[None]).float().to(self.device)
            out = self.model(t)[0].clamp(0, 1).cpu().numpy()
        return out

    def upsample(self, image: np.ndarray, scale: int = 4) -> np.ndarray:
        s = self._native_scale
        gray = image.ndim == 2 or image.shape[-1] == 1
        img = image[..., 0] if (image.ndim == 3 and gray) else image
        if gray:
            img = np.stack([img] * 3, axis=-1)
        h, w = img.shape[:2]
        chw = np.ascontiguousarray(
            np.clip(img, 0.0, 1.0).transpose(2, 0, 1).astype(np.float32)
        )
        out = np.zeros((3, h * s, w * s), np.float32)
        for y0 in range(0, h, self.tile):
            for x0 in range(0, w, self.tile):
                y1, x1 = min(y0 + self.tile, h), min(x0 + self.tile, w)
                py0, px0 = max(y0 - self.tile_pad, 0), max(x0 - self.tile_pad, 0)
                py1, px1 = min(y1 + self.tile_pad, h), min(x1 + self.tile_pad, w)
                up = self._run_tile(chw[:, py0:py1, px0:px1])
                oy, ox = (y0 - py0) * s, (x0 - px0) * s
                out[:, y0 * s : y1 * s, x0 * s : x1 * s] = up[
                    :, oy : oy + (y1 - y0) * s, ox : ox + (x1 - x0) * s
                ]
        res = out.transpose(1, 2, 0)
        if gray:
            res = res.mean(axis=-1)
            if image.ndim == 3:
                res = res[..., None]
        if scale != s:  # model has a fixed native scale; resample to match
            from PIL import Image

            im = Image.fromarray(
                np.clip(res * 255, 0, 255).astype(np.uint8).squeeze()
            )
            im = im.resize((w * scale, h * scale), Image.BICUBIC)
            res = np.asarray(im, dtype=np.float32) / 255.0
            if image.ndim == 3 and gray:
                res = res[..., None]
        return res


# ---------------------------------------------------------------------------
# cached artifacts (vis_info / bg_info hand-off)
# ---------------------------------------------------------------------------


def save_vis_info(path: str, views: list[dict]) -> None:
    """vis_info_{i}.pkl: list of per-view dicts {pose [4,4], rgb, normal,
    mask, ortho_half_extent} — the generated-view supervision pack the
    reference writes in Stage 2 and consumes in Stages 3/4
    (holoscene_train_post.py:1981-1989)."""
    with open(path, "wb") as f:
        pickle.dump(views, f)


def load_vis_info(path: str) -> list[dict]:
    with open(path, "rb") as f:
        return pickle.load(f)


class CachedArtifactNovelViewProvider(NovelViewProvider):
    """Replays vis_info packs recorded by a previous run — the first-class
    path for using REAL hallucinated views (Wonder3D+ outputs produced on a
    GPU box, or any other source) in the TPU pipeline: record them in the
    vis_info_{i}.pkl convention and point this provider at the directory.
    The pipeline behaves identically to having the generative model
    in-process (reference artifact hand-off, holoscene_train_post.py:
    1981-1989)."""

    def __init__(self, cache_dir: str, obj_i: int | None = None):
        self.cache_dir = cache_dir
        self._fixed_obj = obj_i

    def generate_views(self, front_rgb, front_mask, poses, seed: int = 42,
                       obj_i: int | None = None):
        oi = self._fixed_obj if self._fixed_obj is not None else obj_i
        path = os.path.join(self.cache_dir, f"vis_info_{oi}.pkl")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no cached views for object {oi} ({path})"
            )
        views = load_vis_info(path)
        return views[: len(poses)] if poses else views


def default_providers(render_fn=None) -> dict:
    """Provider set for the Stage-2 runner. Checkpoint-free fallbacks by
    default; real TorchScript models attach automatically when these env
    vars point at exported checkpoints (errors propagate — a set-but-broken
    path should fail loudly, not silently fall back):

      HOLOSCENE_LAMA_CKPT    TorchScript big-lama (or trainer dir) -> inpaint
      HOLOSCENE_NORMAL_CKPT  TorchScript Omnidata DPT              -> normal
      HOLOSCENE_SR_CKPT      TorchScript Real-ESRGAN RRDBNet       -> upsample
      HOLOSCENE_VIEW_CACHE   recorded vis_info_{i}.pkl directory   -> novel_view
    """
    providers: dict = {
        "inpaint": NullInpaintProvider(),
        "novel_view": (
            ModelRenderNovelViewProvider(render_fn) if render_fn else None
        ),
        "normal": DepthGradientNormalEstimator(),
        "upsample": BicubicUpsampler(),
    }
    lama = os.environ.get("HOLOSCENE_LAMA_CKPT")
    if lama:
        providers["inpaint"] = TorchLamaProvider(lama)
    normal = os.environ.get("HOLOSCENE_NORMAL_CKPT")
    if normal:
        providers["normal"] = TorchScriptNormalEstimator(normal)
    sr = os.environ.get("HOLOSCENE_SR_CKPT")
    if sr:
        providers["upsample"] = TorchScriptUpsampler(sr)
    cache = os.environ.get("HOLOSCENE_VIEW_CACHE")
    if cache:
        providers["novel_view"] = CachedArtifactNovelViewProvider(cache)
    return providers
