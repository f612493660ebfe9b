"""Stage-2 provider plumbing: the TorchScript LaMa plug and the
first-class cached-generative-view path (VERDICT r1 #4)."""

from __future__ import annotations

import numpy as np
import pytest

from holoscene_tpu.stage2.providers import (
    CachedArtifactNovelViewProvider,
    TorchLamaProvider,
    save_vis_info,
)


def _make_jit_lama(path):
    """A tiny TorchScript module honoring the big-lama JIT contract:
    (image [1,3,H,W], mask [1,1,H,W]) -> [1,3,H,W]. Fills the masked
    region with the known-region mean (enough to verify the plumbing:
    padding, permutes, composition)."""
    torch = pytest.importorskip("torch")

    class FakeLama(torch.nn.Module):
        def forward(self, image, mask):
            known = image * (1.0 - mask)
            denom = torch.clamp((1.0 - mask).sum() * image.shape[1], min=1.0)
            mean = known.sum(dim=(2, 3), keepdim=True) / torch.clamp(
                (1.0 - mask).sum(), min=1.0
            )
            return image * (1.0 - mask) + mean * mask

    scripted = torch.jit.script(FakeLama())
    torch.jit.save(scripted, str(path))
    return str(path)


def test_torch_lama_provider_jit_checkpoint(tmp_path):
    ckpt = _make_jit_lama(tmp_path / "big-lama.pt")
    provider = TorchLamaProvider(ckpt)

    img = np.full((31, 33, 3), 0.25, np.float32)  # odd dims exercise padding
    img[5:10, 5:10] = 0.9
    mask = np.zeros((31, 33), bool)
    mask[5:10, 5:10] = True

    out = provider.inpaint(img, mask)
    assert out.shape == img.shape
    # unmasked region untouched
    np.testing.assert_allclose(out[~mask], img[~mask])
    # masked region replaced by ~the known mean (0.25), not 0.9
    assert np.abs(out[mask] - 0.25).max() < 0.05

    # 1-channel image round-trips through the 3-channel model
    d = np.linspace(0, 1, 31 * 33).reshape(31, 33, 1).astype(np.float32)
    out_d = provider.inpaint(d, mask)
    assert out_d.shape == d.shape
    np.testing.assert_allclose(out_d[~mask], d[~mask])


def test_torch_lama_provider_missing_checkpoint(tmp_path):
    pytest.importorskip("torch")
    with pytest.raises(FileNotFoundError):
        TorchLamaProvider(str(tmp_path / "nope.pt"))


def _make_jit_sr(path, scale=4):
    """A tiny TorchScript module honoring the Real-ESRGAN JIT contract:
    (image [1,3,H,W] in [0,1]) -> [1,3,H*s,W*s]. Nearest-upsamples (exact,
    so tiling seams are detectable as any deviation)."""
    torch = pytest.importorskip("torch")

    class FakeSR(torch.nn.Module):
        def __init__(self, s: int):
            super().__init__()
            self.s = s

        def forward(self, image):
            return torch.nn.functional.interpolate(
                image, scale_factor=float(self.s), mode="nearest"
            )

    scripted = torch.jit.script(FakeSR(scale))
    torch.jit.save(scripted, str(path))
    return str(path)


def test_torchscript_upsampler(tmp_path):
    from holoscene_tpu.stage2.providers import TorchScriptUpsampler

    ckpt = _make_jit_sr(tmp_path / "realesrgan.pt", scale=4)
    up = TorchScriptUpsampler(ckpt, tile=16, tile_pad=4)  # force tiling
    assert up._native_scale == 4

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (37, 29, 3)).astype(np.float32)  # odd dims
    out = up.upsample(img, scale=4)
    assert out.shape == (37 * 4, 29 * 4, 3)
    # nearest-exact model => tiled output must equal the untiled upsample
    ref = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # grayscale [H,W,1] round-trips
    g = rng.uniform(0, 1, (16, 16, 1)).astype(np.float32)
    out_g = up.upsample(g, scale=4)
    assert out_g.shape == (64, 64, 1)

    # requested scale != native scale resamples to the requested size
    out2 = up.upsample(img, scale=2)
    assert out2.shape == (37 * 2, 29 * 2, 3)

    with pytest.raises(FileNotFoundError):
        TorchScriptUpsampler(str(tmp_path / "nope.pt"))


def test_default_providers_env_attach(tmp_path, monkeypatch):
    from holoscene_tpu.stage2.providers import (
        TorchScriptUpsampler,
        default_providers,
    )

    ckpt = _make_jit_sr(tmp_path / "sr.pt")
    cache = tmp_path / "views"
    cache.mkdir()
    monkeypatch.setenv("HOLOSCENE_SR_CKPT", str(ckpt))
    monkeypatch.setenv("HOLOSCENE_VIEW_CACHE", str(cache))
    p = default_providers()
    assert isinstance(p["upsample"], TorchScriptUpsampler)
    assert isinstance(p["novel_view"], CachedArtifactNovelViewProvider)

    monkeypatch.setenv("HOLOSCENE_SR_CKPT", str(tmp_path / "missing.pt"))
    with pytest.raises(FileNotFoundError):  # set-but-broken fails loudly
        default_providers()


def _fake_view_pack(res=16, seed=0):
    rng = np.random.default_rng(seed)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, -1]
    return {
        "pose": pose,
        "half_extent": 0.7,
        "rgb": rng.uniform(0, 1, (res, res, 3)).astype(np.float32),
        "normal": np.tile(
            np.array([0, 0, -1], np.float32), (res, res, 1)
        ),
        "mask": np.ones((res, res), bool),
    }


def test_cached_provider_replays_vis_info(tmp_path):
    views = [_fake_view_pack(seed=i) for i in range(3)]
    save_vis_info(str(tmp_path / "vis_info_2.pkl"), views)

    provider = CachedArtifactNovelViewProvider(str(tmp_path))
    out = provider.generate_views(None, None, [np.eye(4)] * 2, obj_i=2)
    assert len(out) == 2
    np.testing.assert_allclose(out[0]["rgb"], views[0]["rgb"])

    with pytest.raises(FileNotFoundError):
        provider.generate_views(None, None, [np.eye(4)], obj_i=5)


def test_cached_provider_drives_runner_novel_view_path(tmp_path):
    """End-to-end: a Stage2Runner whose novel-view provider replays
    recorded vis_info packs — the pipeline consumes cached hallucinated
    views exactly like live ones (VERDICT #4 'done' criterion)."""
    import jax

    from holoscene_tpu.datasets.ns_dataset import NSDataset
    from holoscene_tpu.datasets.synthetic import generate_scene
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.stage2.refine import FinetuneConfig
    from holoscene_tpu.stage2.runner import Stage2Runner
    from tests.test_stage2_runner import tiny_cfg

    root = tmp_path / "data"
    generate_scene(str(root / "scene_0"), n_images=5, img_res=(32, 32))
    scene = NSDataset(str(root), "scene_0", img_res=(32, 32))

    cfg = tiny_cfg(len(scene.label_mapping))
    params = init_holoscene(jax.random.PRNGKey(0), cfg)

    cache = tmp_path / "cache"
    cache.mkdir()
    for oi in range(1, len(scene.label_mapping)):
        save_vis_info(
            str(cache / f"vis_info_{oi}.pkl"),
            [_fake_view_pack(res=24, seed=oi * 10 + k) for k in range(6)],
        )

    runner = Stage2Runner(
        params, cfg, scene, out_dir=str(tmp_path / "s2"),
        loss_cfg=LossConfig(depth_weight=0.1, semantic_weight=0.5),
        finetune_cfg=FinetuneConfig(
            iters=2, rays_per_step=64, invis_pixels=64, collision_pts=128,
        ),
        mesh_resolution=32, view_render_res=24,
        candidate_levels=(0.0,),
        coverage_threshold=2.0,  # force the novel-view path for every object
        quiet=True,
    )
    runner.providers["novel_view"] = CachedArtifactNovelViewProvider(
        str(cache)
    )
    result = runner.run(finetune_iters=2)
    assert (tmp_path / "s2" / "translation_dict.pkl").exists()
    # the cached views were consumed and re-emitted as this run's vis_info
    emitted = [
        p for p in (tmp_path / "s2").iterdir()
        if p.name.startswith("vis_info_")
    ]
    assert emitted, "cached hallucinated views must flow through to artifacts"


# ---------------------------------------------------------------------------
# live Wonder3D+ provider (DiffusersNovelViewProvider)
# ---------------------------------------------------------------------------


def _make_jit_w3d(path):
    """Tiny scripted stand-in for the Wonder3D+ joint denoiser contract:
    model(imgs_in [2Nv,3,H,W], cam [2Nv,7], noise) -> [2Nv,3,H,W] in [0,1],
    first Nv normal-domain, last Nv colors. Encodes the task embedding and
    azimuth into the output so the test can verify the batch layout the
    provider builds (run_mv_prediction.py:386-420 contract)."""
    torch = pytest.importorskip("torch")

    class StandInW3D(torch.nn.Module):
        def forward(self, imgs, cam, noise):
            az = cam[:, 2].view(-1, 1, 1, 1)
            is_normal = cam[:, 5].view(-1, 1, 1, 1)  # task emb [1,0]=normal
            # colors: keep white bg white, darken the object by azimuth
            colors = 1.0 - (1.0 - imgs) * (0.5 + 0.4 * torch.cos(az))
            colors = colors + 0.01 * noise
            # normals: constant +z in the conditioning frame (n01 encoding)
            normal01 = torch.zeros_like(imgs)
            normal01[:, 0] = 0.5
            normal01[:, 1] = 0.5
            normal01[:, 2] = 1.0
            out = is_normal * normal01 + (1.0 - is_normal) * colors
            return torch.clamp(out, 0.0, 1.0)

    torch.jit.script(StandInW3D()).save(path)


def _front_view(res=64):
    rng = np.random.default_rng(0)
    rgb = np.ones((res, res, 3), np.float32)
    mask = np.zeros((res, res), bool)
    mask[res // 4: 3 * res // 4, res // 4: 3 * res // 4] = True
    rgb[mask] = rng.uniform(0.0, 0.4, (mask.sum(), 3))
    return rgb, mask


def test_diffusers_provider_contract(tmp_path):
    pytest.importorskip("torch")
    from holoscene_tpu.stage2.providers import (
        DiffusersNovelViewProvider,
        ThresholdForegroundExtractor,
    )
    from holoscene_tpu.stage2.views import wonder3d_camera_rig

    ckpt = str(tmp_path / "w3d.pt")
    _make_jit_w3d(ckpt)
    prov = DiffusersNovelViewProvider(
        ckpt, img_size=64, fg_extractor=ThresholdForegroundExtractor()
    )
    rgb, mask = _front_view()
    rig = wonder3d_camera_rig(np.zeros(3), 1.0)
    views = prov.generate_views(rgb, mask, rig, seed=42)

    assert len(views) == 6
    for vi, v in enumerate(views):
        assert v["rgb"].shape == (64, 64, 3)
        assert v["normal"].shape == (64, 64, 3)
        assert v["mask"].shape == (64, 64) and v["mask"].dtype == bool
        assert v["front"] == (vi == 0)
        np.testing.assert_allclose(
            np.linalg.norm(v["normal"], axis=-1), 1.0, atol=1e-4)
    # threshold FG extraction recovers the object region (white bg stays bg)
    front_mask = views[0]["mask"]
    assert front_mask[32, 32] and not front_mask[2, 2]
    # back view (azimuth pi): +z normal in the conditioning frame maps to
    # rot_y(pi) @ (0,0,1) = (0,0,-1), then the y/z flip -> (0,0,+1)
    back = views[3]["normal"]
    np.testing.assert_allclose(back[32, 32], [0.0, 0.0, 1.0], atol=1e-3)
    # front view (azimuth 0): (0,0,1) -> flip -> (0,0,-1) (towards camera)
    np.testing.assert_allclose(
        views[0]["normal"][32, 32], [0.0, 0.0, -1.0], atol=1e-3)

    # seed determinism: same seed reproduces, different seed differs
    again = prov.generate_views(rgb, mask, rig, seed=42)
    np.testing.assert_array_equal(views[1]["rgb"], again[1]["rgb"])
    other = prov.generate_views(rgb, mask, rig, seed=7)
    assert np.abs(views[1]["rgb"] - other[1]["rgb"]).max() > 1e-5


def test_diffusers_provider_sr_pass(tmp_path):
    pytest.importorskip("torch")
    from holoscene_tpu.stage2.providers import (
        BicubicUpsampler,
        DiffusersNovelViewProvider,
        ThresholdForegroundExtractor,
    )
    from holoscene_tpu.stage2.views import wonder3d_camera_rig

    ckpt = str(tmp_path / "w3d.pt")
    _make_jit_w3d(ckpt)
    prov = DiffusersNovelViewProvider(
        ckpt, img_size=32, fg_extractor=ThresholdForegroundExtractor(),
        upsampler=BicubicUpsampler(), sr_scale=2,
    )
    rgb, mask = _front_view(res=32)
    rig = wonder3d_camera_rig(np.zeros(3), 1.0)
    views = prov.generate_views(rgb, mask, rig, seed=1)
    for v in views:
        assert v["rgb"].shape == (64, 64, 3)       # SR doubled
        assert v["mask"].shape == (64, 64)
        assert v["normal"].shape == (64, 64, 3)    # resized to match


def test_diffusers_provider_missing_checkpoint(tmp_path):
    pytest.importorskip("torch")
    from holoscene_tpu.stage2.providers import DiffusersNovelViewProvider

    with pytest.raises(FileNotFoundError):
        DiffusersNovelViewProvider(str(tmp_path / "nope.pt"))


def test_default_providers_w3d_env(tmp_path, monkeypatch):
    pytest.importorskip("torch")
    from holoscene_tpu.stage2.providers import (
        DiffusersNovelViewProvider,
        default_providers,
    )

    ckpt = str(tmp_path / "w3d.pt")
    _make_jit_w3d(ckpt)
    monkeypatch.setenv("HOLOSCENE_W3D_CKPT", ckpt)
    prov = default_providers()
    assert isinstance(prov["novel_view"], DiffusersNovelViewProvider)


class TestPromptableExtraction:
    """SAM-class box-prompted foreground extraction (VERDICT r3 #8;
    reference remove_bg_with_rembg_sam, run_mv_prediction.py:32-113)."""

    def _cluttered_scene(self):
        """Object = two disconnected blobs near the center (occlusion
        split); clutter = a stripe hugging the left border."""
        img = np.ones((64, 64, 3), np.float32)
        img[20:40, 24:34] = 0.2   # main body
        img[44:52, 26:32] = 0.3   # separated part (e.g. a leg)
        img[4:60, 0:3] = 0.1      # off-prompt border clutter
        return img

    def test_central_box_matches_reference_formula(self):
        from holoscene_tpu.stage2.providers import (
            PromptableForegroundExtractor,
        )

        box = PromptableForegroundExtractor.central_box(100, 200)
        x_min, x_max = 0.15 * 200, 0.85 * 200
        y_min, y_max = 0.15 * 100, 0.85 * 100
        xp, yp = int(0.1 * (x_max - x_min)), int(0.1 * (y_max - y_min))
        np.testing.assert_allclose(
            box, [x_min - xp, y_min - yp, x_max + xp, y_max + yp])

    def test_box_guided_keeps_split_parts_rejects_clutter(self):
        from holoscene_tpu.stage2.providers import (
            BoxGuidedThresholdExtractor,
            ThresholdForegroundExtractor,
        )

        img = self._cluttered_scene()
        boxed = BoxGuidedThresholdExtractor().extract(img)
        assert boxed[30, 29] and boxed[48, 29]   # both object parts kept
        assert not boxed[30, 1]                   # border clutter rejected
        # keep-largest drops the separated part — the gap the prompt closes
        largest = ThresholdForegroundExtractor().extract(img)
        assert largest[30, 29] and not largest[48, 29]

    def test_box_guided_degenerate_prompt_falls_back_to_largest(self):
        from holoscene_tpu.stage2.providers import (
            BoxGuidedThresholdExtractor,
        )

        img = self._cluttered_scene()
        # a prompt box over empty space claims nothing -> largest component
        mask = BoxGuidedThresholdExtractor().extract_box(
            img, np.array([50.0, 4.0, 60.0, 12.0]))
        assert mask[30, 29] and not mask[30, 1]

    def test_torchscript_promptable_contract(self, tmp_path):
        torch = pytest.importorskip("torch")

        class BoxSegmenter(torch.nn.Module):
            """Mock SAM: logits positive exactly inside the box and dark."""

            def forward(self, image, box):
                h, w = image.shape[2], image.shape[3]
                yy = torch.arange(h).view(1, 1, h, 1).float()
                xx = torch.arange(w).view(1, 1, 1, w).float()
                inside = (
                    (xx >= box[0, 0]) & (xx <= box[0, 2])
                    & (yy >= box[0, 1]) & (yy <= box[0, 3])
                )
                dark = image.mean(dim=1, keepdim=True) < 0.8
                return torch.where(
                    inside & dark, torch.ones(1), -torch.ones(1))

        ckpt = str(tmp_path / "sam_mock.pt")
        torch.jit.save(torch.jit.script(BoxSegmenter()), ckpt)

        from holoscene_tpu.stage2.providers import (
            TorchScriptPromptableExtractor,
        )

        ext = TorchScriptPromptableExtractor(ckpt)
        img = self._cluttered_scene()
        mask = ext.extract_box(img, np.array([20.0, 16.0, 40.0, 56.0]))
        assert mask.shape == (64, 64) and mask.dtype == bool
        assert mask[30, 29] and mask[48, 29] and not mask[30, 1]
        # the plain extract() path prompts the reference central box
        mask2 = ext.extract(img)
        assert mask2[30, 29] and not mask2[30, 1]

    def test_default_extractor_resolves_sam_ts_env(self, tmp_path,
                                                   monkeypatch):
        torch = pytest.importorskip("torch")

        class Trivial(torch.nn.Module):
            def forward(self, image, box):
                return image.mean(dim=1, keepdim=True) * 0 + 1.0

        ckpt = str(tmp_path / "sam.pt")
        torch.jit.save(torch.jit.script(Trivial()), ckpt)
        monkeypatch.setenv("HOLOSCENE_SAM_TS", ckpt)

        from holoscene_tpu.stage2.providers import (
            TorchScriptPromptableExtractor,
            default_foreground_extractor,
        )

        assert isinstance(default_foreground_extractor(),
                          TorchScriptPromptableExtractor)
