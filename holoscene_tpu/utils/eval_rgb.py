"""Image quality metrics: PSNR, SSIM, LPIPS (optional provider).

Reference semantics: utils/eval_rgb.py:7-46 — skimage PSNR/SSIM + lpips-alex
on [0,1] HWC images. PSNR/SSIM are implemented here directly (numpy,
skimage-compatible: gaussian-free uniform 7x7 window matches
skimage.structural_similarity defaults with data_range=1). LPIPS needs
pretrained AlexNet weights; `lpips_fn()` returns a callable when the
`lpips` package + weights are importable, else None (callers report NaN).
"""

from __future__ import annotations

import numpy as np


def psnr(img1: np.ndarray, img2: np.ndarray, data_range: float = 1.0) -> float:
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """Separable uniform filter over the first two axes ('valid'-interior,
    edge-replicated like scipy.ndimage uniform_filter default reflect)."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=(size, size) + (0,) * (x.ndim - 2))


def ssim(
    img1: np.ndarray,
    img2: np.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean SSIM matching skimage.structural_similarity defaults
    (uniform window, channel-average)."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]

    np_ = win_size ** 2
    cov_norm = np_ / (np_ - 1)
    ux = _uniform_filter(img1, win_size)
    uy = _uniform_filter(img2, win_size)
    uxx = _uniform_filter(img1 * img1, win_size)
    uyy = _uniform_filter(img2 * img2, win_size)
    uxy = _uniform_filter(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


_LPIPS_CACHE: dict = {}


def lpips_fn():
    """Returns lpips(img1_hwc01, img2_hwc01) -> float, or None when no LPIPS
    backend is available. Resolution order:

      1. the torch `lpips` package with its pretrained weights;
      2. the hermetic JAX implementation (utils/lpips_jax.py) from a
         converted weight file ($HOLOSCENE_LPIPS_NPZ or
         ~/.cache/holoscene/lpips_alex.npz — scripts/export_lpips_npz.py);
      3. None (callers report NaN with a one-time warning)."""
    if "fn" in _LPIPS_CACHE:
        return _LPIPS_CACHE["fn"]
    try:
        import torch
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="alex")

        def fn(a, b):
            ta = torch.from_numpy(
                np.asarray(a, dtype=np.float32).transpose(2, 0, 1)[None] * 2 - 1
            )
            tb = torch.from_numpy(
                np.asarray(b, dtype=np.float32).transpose(2, 0, 1)[None] * 2 - 1
            )
            with torch.no_grad():
                return float(net(ta, tb).item())

        _LPIPS_CACHE["fn"] = fn
        return fn
    except Exception:
        pass
    try:
        from holoscene_tpu.utils.lpips_jax import lpips_from_npz

        _LPIPS_CACHE["fn"] = lpips_from_npz()  # None when no weight file
    except Exception:
        _LPIPS_CACHE["fn"] = None
    return _LPIPS_CACHE["fn"]


_LPIPS_WARNED = [False]


def eval_rgb(pred: np.ndarray, gt: np.ndarray) -> dict:
    """Full metric dict for one image pair (reference eval_rgb.py:39-46).

    LPIPS needs the `lpips` package + its AlexNet weights; without them the
    metric is reported as NaN and a one-time warning is printed so NaNs in
    eval tables are never silent (a substitute feature net would not be
    LPIPS — better to be explicit)."""
    out = {"psnr": psnr(pred, gt), "ssim": ssim(pred, gt)}
    lp = lpips_fn()
    if lp is None:
        if not _LPIPS_WARNED[0]:
            _LPIPS_WARNED[0] = True
            import warnings

            warnings.warn(
                "LPIPS unavailable (lpips package or its weights missing): "
                "reporting lpips=NaN in eval metrics",
                stacklevel=2,
            )
        out["lpips"] = float("nan")
    else:
        out["lpips"] = lp(pred, gt)
    return out
