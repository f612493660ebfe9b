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
    """Plug point for a real LaMa checkpoint (reference lama/utils.py)."""

    def __init__(self, checkpoint_dir: str):
        raise NotImplementedError(
            "LaMa checkpoints are not bundled; point this provider at a "
            "big-lama checkpoint directory and wire its torch module here."
        )

    def inpaint(self, image, mask):  # pragma: no cover
        raise NotImplementedError


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
    ) -> list[dict]:
        """Returns per-pose dicts {rgb [H,W,3], normal [H,W,3] (camera
        frame), mask [H,W]} (the Wonder3D+ output contract,
        run_mv_prediction.py:702-808)."""


class ModelRenderNovelViewProvider(NovelViewProvider):
    """Fallback: 'novel views' are the current SDF model's own renders from
    the requested poses (no hallucination of unseen surfaces, but the same
    artifact shapes flow through the pipeline)."""

    def __init__(self, render_fn):
        """render_fn(pose, seed) -> {rgb, normal, mask} in Wonder3D layout."""
        self.render_fn = render_fn

    def generate_views(self, front_rgb, front_mask, poses, seed: int = 42):
        return [self.render_fn(pose, seed) for pose in poses]


# ---------------------------------------------------------------------------
# monocular normals (Omnidata counterpart)
# ---------------------------------------------------------------------------


class NormalEstimator(abc.ABC):
    @abc.abstractmethod
    def infer_normal(self, image: np.ndarray, depth: np.ndarray | None = None
                     ) -> np.ndarray:
        """[H,W,3] camera-frame unit normals in [-1,1]."""


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
    """Replays vis_info packs recorded by a previous (possibly GPU) run."""

    def __init__(self, cache_dir: str, obj_i: int):
        self.views = load_vis_info(
            os.path.join(cache_dir, f"vis_info_{obj_i}.pkl")
        )

    def generate_views(self, front_rgb, front_mask, poses, seed: int = 42):
        return self.views[: len(poses)]


def default_providers(render_fn=None) -> dict:
    return {
        "inpaint": NullInpaintProvider(),
        "novel_view": (
            ModelRenderNovelViewProvider(render_fn) if render_fn else None
        ),
        "normal": DepthGradientNormalEstimator(),
        "upsample": BicubicUpsampler(),
    }
