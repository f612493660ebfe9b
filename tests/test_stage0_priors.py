"""Stage-0 prior generation CLI (VERDICT r1 missing #5): TorchScript
provider + cached replay, artifact format consumable by NSDataset."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest


def _scene_with_images(root, n=3, res=24):
    from PIL import Image

    img_dir = root / "scene_0" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (res, res, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"{i:04d}.png")
    return root / "scene_0"


def _make_jit_priors(tmp_path):
    torch = pytest.importorskip("torch")

    class Depth(torch.nn.Module):
        def forward(self, image):
            # plausible depth: brightness-based
            return image.mean(dim=1, keepdim=True) + 0.5

    class Normal(torch.nn.Module):
        def forward(self, image):
            n = torch.zeros_like(image)
            n[:, 2] = -1.0
            return n

    dp = str(tmp_path / "depth.pt")
    npth = str(tmp_path / "normal.pt")
    torch.jit.save(torch.jit.script(Depth()), dp)
    torch.jit.save(torch.jit.script(Normal()), npth)
    return dp, npth


def test_generate_priors_torchscript(tmp_path):
    from holoscene_tpu.stage0.priors import (
        TorchScriptPriorProvider,
        generate_priors,
    )

    scene = _scene_with_images(tmp_path)
    dp, npp = _make_jit_priors(tmp_path)
    provider = TorchScriptPriorProvider(dp, npp)
    depths, normals = generate_priors(str(scene), provider=provider)
    assert len(depths) == 3 and len(normals) == 3
    d = np.load(depths[0])
    assert d.shape == (24, 24) and d.dtype == np.float32
    from PIL import Image

    n = np.asarray(Image.open(normals[0]), dtype=np.float32) / 255 * 2 - 1
    # z = -1 maps to png value 0 on the blue channel
    assert abs(n[..., 2].mean() + 1.0) < 0.02


def test_priors_cli_and_cached_replay(tmp_path):
    pytest.importorskip("torch")
    scene = _scene_with_images(tmp_path)
    dp, npp = _make_jit_priors(tmp_path)
    res = subprocess.run(
        [sys.executable, "-m", "holoscene_tpu.stage0.priors",
         "--scene_dir", str(scene),
         "--depth_checkpoint", dp, "--normal_checkpoint", npp],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    assert os.path.exists(scene / "depth" / "0000.npy")
    assert os.path.exists(scene / "normal" / "0000.png")

    # cached replay into a fresh scene (the recorded-artifact path)
    scene2 = _scene_with_images(tmp_path / "second")
    from holoscene_tpu.stage0.priors import generate_priors

    d2, n2 = generate_priors(str(scene2), cache_dir=str(scene))
    assert np.allclose(np.load(d2[1]), np.load(scene / "depth" / "0001.npy"))
