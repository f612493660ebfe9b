"""scripts/export_wonder3d_ts.py: the TorchScript exporter must produce a
file that satisfies DiffusersNovelViewProvider's JIT contract end-to-end
(the export_lpips_npz pattern — structure pinned with a mock pipeline, the
real checkpoint only needed on the box that runs the export)."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_cd_reshape_roundtrip():
    from export_wonder3d_ts import JointDenoiserWrapper

    x = torch.arange(8.0).view(8, 1)
    cd = JointDenoiserWrapper._cd_input(x)
    # [n_uc(0,1), r_uc(2,3), n_c(4,5), r_c(6,7)] -> [n_uc, n_c, r_uc, r_c]
    assert cd.view(-1).tolist() == [0, 1, 4, 5, 2, 3, 6, 7]
    back = JointDenoiserWrapper._cfg_output(cd)
    # cfg layout groups uncond first, cond second: [n_uc, r_uc, n_c, r_c]
    assert back.view(-1).tolist() == [0, 1, 2, 3, 4, 5, 6, 7]


def test_ddim_coefficients_monotone():
    from export_wonder3d_ts import MockScheduler, ddim_coefficients

    rows = ddim_coefficients(MockScheduler(), 10)
    assert len(rows) == 10
    ts = [r[0] for r in rows]
    assert ts == sorted(ts, reverse=True)  # descending timesteps
    for _t, a_t, a_prev in rows:
        assert 0 < a_t < a_prev <= 1.0  # denoising increases alpha_cumprod


def test_mock_export_feeds_the_provider(tmp_path):
    """CLI --mock export -> torch.jit.load through the provider -> a full
    generate_views pass returns the 6-view rig with unit normals."""
    out = str(tmp_path / "wonder3d_joint_mock.pt")
    subprocess.run(
        [sys.executable, "scripts/export_wonder3d_ts.py",
         "--mock", "--out", out, "--views", "6"],
        check=True, cwd=REPO,
    )

    from holoscene_tpu.stage2.providers import DiffusersNovelViewProvider

    provider = DiffusersNovelViewProvider(out, img_size=64)
    assert provider._kind == "jit"
    rng = np.random.default_rng(0)
    front = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    mask = np.zeros((48, 48), np.float32)
    mask[12:36, 12:36] = 1.0
    views = provider.generate_views(front, mask, poses=None, seed=11)
    assert len(views) == 6
    assert views[0]["front"] and not views[1]["front"]
    for v in views:
        assert v["rgb"].shape == (64, 64, 3)
        assert np.isfinite(v["rgb"]).all()
        assert v["rgb"].min() >= 0.0 and v["rgb"].max() <= 1.0
        assert v["normal"].shape == (64, 64, 3)
        n = np.linalg.norm(v["normal"], axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)
        assert v["mask"].shape == (64, 64)

    # determinism in the seed: same seed -> identical pixels
    views2 = provider.generate_views(front, mask, poses=None, seed=11)
    np.testing.assert_array_equal(views[2]["rgb"], views2[2]["rgb"])
    # different seed -> different noise -> different output
    views3 = provider.generate_views(front, mask, poses=None, seed=12)
    assert np.abs(views[2]["rgb"] - views3[2]["rgb"]).max() > 1e-6


def test_wrapper_consumes_caller_noise_deterministically():
    """The initial latents must be a pure function of the provided noise
    tensor (caller-controlled seeding): same noise -> identical output,
    changed noise -> changed output."""
    from export_wonder3d_ts import build_mock_wrapper

    w = build_mock_wrapper(steps=2, num_views=2)
    w.eval()
    imgs = torch.rand(4, 3, 32, 32)
    cam = torch.randn(4, 7)
    n1 = torch.randn(4, 3, 32, 32)
    with torch.no_grad():
        a = w(imgs, cam, n1)
        b = w(imgs, cam, n1.clone())
        c = w(imgs, cam, n1 + 0.5)
    assert torch.equal(a, b)
    assert (a - c).abs().max() > 1e-7
