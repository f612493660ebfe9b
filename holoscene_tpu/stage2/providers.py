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
# foreground extraction for generated views (SAM / rembg counterpart)
# ---------------------------------------------------------------------------


class ForegroundExtractor(abc.ABC):
    @abc.abstractmethod
    def extract(self, image: np.ndarray) -> np.ndarray:
        """[H,W,3] float01 image on (near-)white background -> [H,W] bool
        foreground mask."""


class ThresholdForegroundExtractor(ForegroundExtractor):
    """Dependency-free foreground mask for diffusion outputs rendered on a
    white background: distance-from-white threshold + largest connected
    region (the reference's largest_connected_region cleanup,
    run_mv_prediction.py:337-353, applied after rembg/SAM)."""

    def __init__(self, white_tol: float = 0.05, keep_largest: bool = True):
        self.white_tol = white_tol
        self.keep_largest = keep_largest

    def extract(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        fg = np.max(np.abs(1.0 - img), axis=-1) > self.white_tol
        if self.keep_largest and fg.any():
            from scipy.ndimage import label
            from scipy.ndimage import sum as ndi_sum

            lab, n = label(fg)
            if n > 1:
                sizes = ndi_sum(fg, lab, index=range(1, n + 1))
                fg = lab == (int(np.argmax(sizes)) + 1)
        return fg


class RembgForegroundExtractor(ForegroundExtractor):
    """The reference's rembg matting on generated views
    (run_mv_prediction.py:441-455 `rembg.remove(..., alpha_matting=True)`).
    Lazy-imports rembg; raises a clear error when unavailable."""

    def __init__(self, alpha_threshold: float = 0.5):
        try:
            import rembg
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "RembgForegroundExtractor needs the rembg package; use "
                "ThresholdForegroundExtractor without it"
            ) from e
        self._rembg = rembg
        self._session = rembg.new_session()
        self.alpha_threshold = alpha_threshold

    def extract(self, image: np.ndarray) -> np.ndarray:  # pragma: no cover
        img8 = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        out = self._rembg.remove(
            img8, alpha_matting=True, session=self._session
        )
        return np.asarray(out)[..., 3] > self.alpha_threshold * 255


class PromptableForegroundExtractor(ForegroundExtractor):
    """SAM-class promptable segmentation: extraction guided by a box prompt
    (the reference prompts SAM with a padded central box on every generated
    view — run_mv_prediction.py:70-102, wired at holoscene_train_post.py:53).
    Subclasses implement extract_box; plain extract() defaults to the
    reference's central box so promptable extractors drop into any
    ForegroundExtractor slot."""

    @staticmethod
    def central_box(height: int, width: int) -> np.ndarray:
        """The reference's box prompt: [0.15, 0.85] of each axis padded by
        10% of the box size, clamped to the image
        (run_mv_prediction.py:70-86). Returns [x0, y0, x1, y1] float."""
        x_min, x_max = 0.15 * width, 0.85 * width
        y_min, y_max = 0.15 * height, 0.85 * height
        x_pad = int(0.1 * (x_max - x_min))
        y_pad = int(0.1 * (y_max - y_min))
        return np.array([
            max(0, x_min - x_pad), max(0, y_min - y_pad),
            min(width - 1, x_max + x_pad), min(height - 1, y_max + y_pad),
        ], np.float32)

    @abc.abstractmethod
    def extract_box(self, image: np.ndarray, box: np.ndarray) -> np.ndarray:
        """[H,W,3] float01 + box prompt [x0,y0,x1,y1] -> [H,W] bool mask."""

    def extract(self, image: np.ndarray) -> np.ndarray:
        h, w = np.asarray(image).shape[:2]
        return self.extract_box(image, self.central_box(h, w))


class BoxGuidedThresholdExtractor(PromptableForegroundExtractor):
    """Dependency-free promptable extraction for cluttered fronts: the
    white-background threshold mask restricted to connected components that
    OVERLAP the prompt box, largest-first until coverage saturates. Where
    ThresholdForegroundExtractor's keep-largest drops secondary parts
    (e.g. a chair leg separated by occlusion), the box prompt keeps every
    component the prompt claims while still rejecting off-prompt clutter
    touching the frame borders."""

    def __init__(self, white_tol: float = 0.05, min_overlap: float = 0.5):
        self.white_tol = white_tol
        # fraction of a component's pixels that must fall inside the box
        self.min_overlap = min_overlap

    def extract_box(self, image: np.ndarray, box: np.ndarray) -> np.ndarray:
        from scipy.ndimage import label

        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        fg = np.max(np.abs(1.0 - img), axis=-1) > self.white_tol
        if not fg.any():
            return fg
        x0, y0, x1, y1 = [float(v) for v in box]
        yy, xx = np.mgrid[0:h, 0:w]
        in_box = (xx >= x0) & (xx <= x1) & (yy >= y0) & (yy <= y1)
        lab, n = label(fg)
        if n <= 1:
            return fg  # single component: the prompt has nothing to reject
        keep = np.zeros_like(fg)
        for i in range(1, n + 1):
            comp = lab == i
            overlap = (comp & in_box).sum() / max(comp.sum(), 1)
            if overlap >= self.min_overlap:
                keep |= comp
        if not keep.any():  # degenerate prompt: fall back to largest
            sizes = np.bincount(lab.reshape(-1))[1:]
            keep = lab == (int(np.argmax(sizes)) + 1)
        return keep


class TorchScriptPromptableExtractor(PromptableForegroundExtractor):
    """SAM behind the hermetic TorchScript pattern (the LaMa/Omnidata
    analog): a scripted promptable segmenter called as
        model(image [1,3,H,W] float01, box [1,4] xyxy) -> [1,1,H,W] logits
    (> 0 = foreground). Export a real SAM with a wrapper that runs the
    image encoder + box-prompt decoder in one trace
    (segment_anything.SamPredictor.predict with box prompts — the
    reference's predictor call at run_mv_prediction.py:91-102)."""

    def __init__(self, checkpoint: str, device: str = "cpu"):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "TorchScriptPromptableExtractor needs torch; use "
                "BoxGuidedThresholdExtractor without it") from e
        self._torch = torch
        self.device = device
        self.model = torch.jit.load(checkpoint, map_location=device)
        self.model.eval()

    def extract_box(self, image: np.ndarray, box: np.ndarray) -> np.ndarray:
        torch = self._torch
        img = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
        t_img = torch.from_numpy(img.transpose(2, 0, 1))[None].to(self.device)
        t_box = torch.from_numpy(
            np.asarray(box, np.float32).reshape(1, 4)).to(self.device)
        with torch.no_grad():
            logits = self.model(t_img, t_box)
        return np.asarray(logits.cpu())[0, 0] > 0.0


def default_foreground_extractor() -> ForegroundExtractor:
    ckpt = os.environ.get("HOLOSCENE_SAM_TS", "")
    if ckpt and os.path.isfile(ckpt):
        try:
            return TorchScriptPromptableExtractor(ckpt)
        except Exception:
            pass
    try:
        return RembgForegroundExtractor()
    except Exception:
        return BoxGuidedThresholdExtractor()


class DiffusersNovelViewProvider(NovelViewProvider):
    """LIVE Wonder3D+ multiview hallucination (reference
    run_mv_prediction.py:316-455 `load_wonder3d_pipeline` /
    `pred_multiview_joint`): a single front view conditions a joint
    normal+color diffusion over the 6-view rig (front, front_right, right,
    back, left, front_left at zero elevation — the exact rig
    stage2/views.py wonder3d_camera_rig builds).

    Two backends, resolved from `checkpoint`:

      * a FILE -> TorchScript joint denoiser (the hermetic analog of the
        big-lama.pt pattern): called as
            model(imgs_in [2*Nv,3,H,W], cam_embeds [2*Nv,7], noise [2*Nv,3,H,W])
        returning [2*Nv,3,H,W] in [0,1] — first Nv images are normal-domain
        predictions (conditioning-camera frame, wonder3d convention), last
        Nv are colors. Export the reference pipeline to this contract with
        torch.jit.trace over a fixed step count.
      * a DIRECTORY -> the reference's diffusers pipeline:
        `MVDiffusionImagePipeline.from_pretrained(dir)` with
        `UNetMV2DConditionModel` (needs the `diffusers` package and the
        reference's `mv_diffusion_30` package importable; checkpoint layout
        = the published flamehaze1115/wonder3d-v1.0 HF tree). Both are
        lazy-imported; a missing dependency raises with instructions
        instead of silently degrading.

    The conditioning batch mirrors MVDiffusionDataset
    (mv_diffusion_30/data/single_image_dataset.py:240-300): the front view
    composited on WHITE, resized to `img_size`; per-view camera embedding
    [elevation_cond=0, d_elevation=0, d_azimuth, cam_type(2)=ortho], task
    embedding [1,0] (normal) / [0,1] (color) appended. Outputs get a
    foreground mask (rembg when available, threshold+largest-region
    otherwise — reference :441), an optional SR pass on colors (reference
    SR before recon, holoscene_train_post.py:1591), and normals rotated
    from the wonder3d conditioning frame into each view's camera frame
    (the azimuth rotation + y/z flip of run_mv_prediction.py:473-490)."""

    # canonical rig azimuths, radians (run_mv_prediction.py:260 VIEWS order;
    # matches stage2/views.py wonder3d_camera_rig offsets)
    VIEW_AZIMUTHS = (0.0, np.pi / 4, np.pi / 2, np.pi, -np.pi / 2, -np.pi / 4)

    def __init__(self, checkpoint: str, device: str = "cpu",
                 img_size: int = 256, guidance_scale: float = 3.0,
                 num_inference_steps: int = 50,
                 fg_extractor: ForegroundExtractor | None = None,
                 upsampler: "Upsampler | None" = None,
                 sr_scale: int = 0):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "DiffusersNovelViewProvider needs torch; use "
                "CachedArtifactNovelViewProvider for replay without it"
            ) from e
        self._torch = torch
        self.device = device
        self.img_size = img_size
        self.guidance_scale = guidance_scale
        self.num_inference_steps = num_inference_steps
        self.fg_extractor = fg_extractor or default_foreground_extractor()
        self.upsampler = upsampler
        self.sr_scale = sr_scale
        if os.path.isfile(checkpoint):
            self.model = torch.jit.load(checkpoint, map_location=device)
            self.model.eval()
            self._kind = "jit"
        elif os.path.isdir(checkpoint):
            self.model = self._load_diffusers_pipeline(checkpoint, device)
            self._kind = "diffusers"
        else:
            raise FileNotFoundError(f"no Wonder3D+ checkpoint at {checkpoint}")

    @staticmethod
    def _load_diffusers_pipeline(ckpt_dir: str, device: str):
        """Reference load_wonder3d_pipeline (run_mv_prediction.py:316-334);
        needs `diffusers` + the reference's `mv_diffusion_30` package."""
        try:  # pragma: no cover - exercised only with real checkpoints
            import torch
            from mv_diffusion_30.models.unet_mv2d_condition import (
                UNetMV2DConditionModel,
            )
            from mv_diffusion_30.pipelines.pipeline_mvdiffusion_image import (
                MVDiffusionImagePipeline,
            )
        except ImportError as e:
            raise RuntimeError(
                "directory-style Wonder3D+ checkpoints need the `diffusers` "
                "and `mv_diffusion_30` packages; export the pipeline to "
                "TorchScript (single-call joint denoiser) instead"
            ) from e
        unet_dir = os.path.join(ckpt_dir, "unet")
        unet = UNetMV2DConditionModel.from_pretrained(  # pragma: no cover
            unet_dir if os.path.isdir(unet_dir) else ckpt_dir
        )
        return MVDiffusionImagePipeline.from_pretrained(  # pragma: no cover
            ckpt_dir, unet=unet, safety_checker=None,
            torch_dtype=torch.float32,
        ).to(device)

    # -- conditioning ------------------------------------------------------

    def _resize(self, img: np.ndarray) -> np.ndarray:
        import jax

        s = self.img_size
        if img.shape[0] == s and img.shape[1] == s:
            return np.asarray(img, np.float32)
        return np.asarray(
            jax.image.resize(
                np.asarray(img, np.float32), (s, s) + img.shape[2:],
                method="bilinear",
            )
        )

    def _conditioning(self, front_rgb, front_mask):
        """White-composited front view + the (Nv, 7) camera+task embeds."""
        rgb = np.asarray(front_rgb, np.float32)
        m = np.asarray(front_mask, np.float32)
        white = rgb * m[..., None] + (1.0 - m[..., None])
        white = np.clip(self._resize(white), 0.0, 1.0)
        nv = len(self.VIEW_AZIMUTHS)
        az = np.asarray(self.VIEW_AZIMUTHS, np.float32) % (2 * np.pi)
        cam = np.stack(
            [np.zeros(nv, np.float32), np.zeros(nv, np.float32), az], axis=-1
        )
        cam_type = np.tile(np.array([0.0, 1.0], np.float32), (nv, 1))  # ortho
        cam = np.concatenate([cam, cam_type], axis=-1)  # (Nv, 5)
        normal_task = np.tile(np.array([1.0, 0.0], np.float32), (nv, 1))
        color_task = np.tile(np.array([0.0, 1.0], np.float32), (nv, 1))
        embeds = np.concatenate(
            [np.concatenate([cam, normal_task], -1),
             np.concatenate([cam, color_task], -1)], axis=0,
        )  # (2*Nv, 7)
        return white, embeds

    @staticmethod
    def _normal_to_camera_frame(normal01, azimuth):
        """Wonder3D normals are predicted in the CONDITIONING camera's frame;
        rotate by the view azimuth about the vertical axis and flip y/z into
        the CV camera convention (run_mv_prediction.py:473-490)."""
        n = np.asarray(normal01, np.float32) * 2.0 - 1.0
        c, s = np.cos(azimuth), np.sin(azimuth)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        n = n @ rot.T
        n[..., 1:3] *= -1.0
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(norm, 1e-8)

    # -- generation --------------------------------------------------------

    def generate_views(self, front_rgb, front_mask, poses, seed: int = 42,
                       obj_i: int | None = None):
        torch = self._torch
        nv = len(self.VIEW_AZIMUTHS)
        white, embeds = self._conditioning(front_rgb, front_mask)
        chw = torch.from_numpy(white.transpose(2, 0, 1))
        imgs_in = chw[None].repeat(2 * nv, 1, 1, 1).to(self.device)
        cam = torch.from_numpy(embeds).to(self.device)
        gen = torch.Generator(device="cpu").manual_seed(seed)

        with torch.no_grad():
            if self._kind == "jit":
                noise = torch.randn(
                    imgs_in.shape, generator=gen, dtype=imgs_in.dtype
                ).to(self.device)
                out = self.model(imgs_in, cam, noise)
            else:  # pragma: no cover - needs real diffusers weights
                out = self.model(
                    imgs_in, cam, generator=gen, output_type="pt",
                    guidance_scale=self.guidance_scale,
                    num_images_per_prompt=1,
                    num_inference_steps=self.num_inference_steps,
                ).images
        out = np.clip(
            np.asarray(out.cpu()).transpose(0, 2, 3, 1), 0.0, 1.0
        )  # [2*Nv, H, W, 3]
        normals01, colors = out[:nv], out[nv:]

        views = []
        for vi in range(nv):
            rgb = colors[vi]
            mask = self.fg_extractor.extract(rgb)
            if self.upsampler is not None and self.sr_scale > 1:
                rgb = np.clip(
                    self.upsampler.upsample(rgb, scale=self.sr_scale), 0, 1
                )
                reps = self.sr_scale
                mask = np.repeat(np.repeat(mask, reps, 0), reps, 1)
            normal = self._normal_to_camera_frame(
                normals01[vi], self.VIEW_AZIMUTHS[vi]
            )
            if normal.shape[:2] != rgb.shape[:2]:
                import jax

                normal = np.asarray(jax.image.resize(
                    normal, rgb.shape[:2] + (3,), method="bilinear"))
                nn = np.linalg.norm(normal, axis=-1, keepdims=True)
                normal = normal / np.maximum(nn, 1e-8)
            views.append(
                {"rgb": rgb, "normal": normal, "mask": mask,
                 "front": vi == 0}
            )
        return views


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
      HOLOSCENE_W3D_CKPT     Wonder3D+ TorchScript joint denoiser  -> novel_view
                             (or diffusers checkpoint dir); wins over
                             the cache — live hallucination when present
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
    w3d = os.environ.get("HOLOSCENE_W3D_CKPT")
    if w3d:
        providers["novel_view"] = DiffusersNovelViewProvider(
            w3d,
            upsampler=providers["upsample"] if sr else None,
            sr_scale=4 if sr else 0,
        )
    return providers
