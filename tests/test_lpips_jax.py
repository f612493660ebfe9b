"""utils/lpips_jax.py vs a torch twin of lpips.LPIPS(net='alex').

The real pretrained weights can't download in a hermetic environment, so
parity is proven on RANDOM weights with the exact lpips-alex shapes: the
torch twin below reproduces the lpips package's forward (scaling layer →
AlexNet feature stack → channel-unit-normalize → squared diff → 1x1
non-negative lins → spatial mean → sum) operator-for-operator. Agreement
on random weights validates the conversion + the JAX conv/pool semantics;
with a real export (scripts/export_lpips_npz.py) the same code IS lpips.
"""

import numpy as np
import pytest

from holoscene_tpu.utils.lpips_jax import (
    _ALEX_CONVS,
    init_random_params,
    load_lpips_npz,
    lpips_from_npz,
    lpips_pair,
)

torch = pytest.importorskip("torch")


def torch_lpips_twin(params, a_hwc01, b_hwc01):
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(
            np.asarray(img, np.float32).transpose(2, 0, 1)[None] * 2 - 1)
        x = (x - shift) / scale
        taps = []
        for i, (_o, _i, _k, s, p, mp) in enumerate(_ALEX_CONVS):
            if mp:
                x = F.max_pool2d(x, kernel_size=3, stride=2)
            x = F.conv2d(
                x, torch.from_numpy(params[f"conv{i}_w"]),
                torch.from_numpy(params[f"conv{i}_b"]), stride=s, padding=p)
            x = F.relu(x)
            taps.append(x)
        return taps

    def unit(x):
        n = torch.sqrt((x * x).sum(dim=1, keepdim=True))
        return x / (n + 1e-10)

    with torch.no_grad():
        total = 0.0
        for i, (xa, xb) in enumerate(zip(feats(a_hwc01), feats(b_hwc01))):
            d = (unit(xa) - unit(xb)) ** 2
            w = torch.from_numpy(params[f"lin{i}_w"]).view(1, -1, 1, 1)
            total += float((d * w).sum(dim=1).mean())
    return total


def test_lpips_jax_matches_torch_twin():
    params = init_random_params(seed=7)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(lpips_pair(params, a, b))
    want = torch_lpips_twin(params, a, b)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-6)
    # identical images -> exactly zero distance
    assert float(lpips_pair(params, a, a)) == pytest.approx(0.0, abs=1e-8)


def test_lpips_npz_roundtrip_and_eval_wiring(tmp_path, monkeypatch):
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **init_random_params(seed=3))
    params = load_lpips_npz(path)
    assert params["conv0_w"].shape == (64, 3, 11, 11)

    monkeypatch.setenv("HOLOSCENE_LPIPS_NPZ", path)
    fn = lpips_from_npz()
    assert fn is not None
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    d = fn(a, b)
    assert np.isfinite(d) and d > 0

    # eval_rgb picks the npz backend up (cache cleared first)
    from holoscene_tpu.utils import eval_rgb

    eval_rgb._LPIPS_CACHE.clear()
    out = eval_rgb.eval_rgb(a, b)
    assert np.isfinite(out["lpips"])
    eval_rgb._LPIPS_CACHE.clear()  # don't leak the env-pointed backend


def test_committed_lin_weights_are_the_published_lpips_v01():
    """The committed linear head (holoscene_tpu/assets/lpips_alex_lin.npz)
    must be bit-identical to the published lpips v0.1 alex head — checked
    against the reference's vendored copy when present (the same BSD-2
    file the lpips package ships). This closes the real-weight gap for the
    head; scripts/fetch_lpips_weights.py assembles the backbone."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lin_path = os.path.join(
        repo, "holoscene_tpu", "assets", "lpips_alex_lin.npz")
    assert os.path.exists(lin_path), "committed lin npz missing"
    with np.load(lin_path) as z:
        lins = {k: np.asarray(z[k]) for k in z.files}
    for i, (out_c, *_rest) in enumerate(_ALEX_CONVS):
        w = lins[f"lin{i}_w"]
        assert w.shape == (out_c,), (i, w.shape)
        assert w.dtype == np.float32
        assert (w >= 0).all(), i  # lpips heads are non-negative
        assert w.max() > 0, i

    ref_pth = "/root/reference/lama/models/lpips_models/alex.pth"
    if not os.path.exists(ref_pth):
        pytest.skip("reference vendored lpips head not on this box")
    d = torch.load(ref_pth, map_location="cpu")
    for i in range(5):
        want = d[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        np.testing.assert_array_equal(lins[f"lin{i}_w"], want)


def test_fetch_lpips_weights_assembles_from_local_backbone(tmp_path):
    """fetch_lpips_weights.py --backbone <local pth> must produce a
    loadable full npz whose head matches the committed asset (mock
    backbone with the exact torchvision alexnet state-dict layout — no
    network)."""
    import os
    import subprocess
    import sys

    from holoscene_tpu.utils.lpips_jax import _ALEX_CONVS as convs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = {}
    rng = np.random.default_rng(5)
    for key, (out_c, in_c, k, _s, _p, _mp) in zip(
        ("features.0", "features.3", "features.6", "features.8",
         "features.10"), convs,
    ):
        sd[f"{key}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (out_c, in_c, k, k)).astype(np.float32))
        sd[f"{key}.bias"] = torch.from_numpy(
            rng.normal(0, 0.01, (out_c,)).astype(np.float32))
    bb = str(tmp_path / "alexnet_mock.pth")
    torch.save(sd, bb)
    out = str(tmp_path / "lpips_alex.npz")
    subprocess.run(
        [sys.executable, "scripts/fetch_lpips_weights.py",
         "--backbone", bb, "--out", out],
        check=True, cwd=repo,
    )
    params = load_lpips_npz(out)
    with np.load(os.path.join(
            repo, "holoscene_tpu", "assets", "lpips_alex_lin.npz")) as z:
        for i in range(5):
            np.testing.assert_array_equal(
                params[f"lin{i}_w"], np.asarray(z[f"lin{i}_w"]))
    # and the assembled file drives the metric
    rng = np.random.default_rng(6)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(lpips_pair(
        {k: np.asarray(v) for k, v in params.items()}, a, b)) > 0


def test_lpips_matches_real_lpips_package():
    lpips_pkg = pytest.importorskip("lpips")
    import tempfile
    import subprocess
    import sys
    import os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lpips_alex.npz")
        subprocess.run(
            [sys.executable, "scripts/export_lpips_npz.py", "--out", path],
            check=True,
        )
        params = load_lpips_npz(path)
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        net = lpips_pkg.LPIPS(net="alex", verbose=False)
        ta = torch.from_numpy(a.transpose(2, 0, 1)[None] * 2 - 1)
        tb = torch.from_numpy(b.transpose(2, 0, 1)[None] * 2 - 1)
        with torch.no_grad():
            want = float(net(ta, tb).item())
        got = float(lpips_pair(params, a, b))
        assert got == pytest.approx(want, rel=1e-4, abs=1e-6)
