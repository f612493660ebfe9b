"""Differentiable SSIM for Stage-4 training losses.

Reference counterpart: pytorch_msssim.SSIM(data_range=1, size_average=True,
channel=3) used in model/gom.py:884 / :1252 — gaussian 11x11 window,
k1=0.01, k2=0.03.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur; img [H, W, C] -> valid-cropped [H', W', C]."""
    k = kernel.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kh), (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kw), (1, 1), "VALID")
    return x[:, 0].transpose(1, 2, 0)


def _blur_chw(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur; img [C, H, W] -> valid-cropped [C, H', W']."""
    k = kernel.shape[0]
    x = img[:, None]                     # [C, 1, H, W]
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kh), (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kw), (1, 1), "VALID")
    return x[:, 0]


@partial(jax.jit, static_argnames=("win_size",))
def ssim_chw(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images — the channels-major twin of `ssim`
    (identical math; the W-minor layout avoids the [*, 3] lane padding the
    HWC path pays on every elementwise op, PERF.md r4 attribution)."""
    kernel = jnp.asarray(_gaussian_kernel(win_size))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _blur_chw(img1, kernel)
    mu2 = _blur_chw(img2, kernel)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1 = _blur_chw(img1 * img1, kernel) - mu1_sq
    sigma2 = _blur_chw(img2 * img2, kernel) - mu2_sq
    sigma12 = _blur_chw(img1 * img2, kernel) - mu12

    s = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )
    return s.mean()


@partial(jax.jit, static_argnames=("win_size",))
def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over [H, W, C] images (differentiable)."""
    kernel = jnp.asarray(_gaussian_kernel(win_size))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _blur(img1, kernel)
    mu2 = _blur(img2, kernel)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1 = _blur(img1 * img1, kernel) - mu1_sq
    sigma2 = _blur(img2 * img2, kernel) - mu2_sq
    sigma12 = _blur(img1 * img2, kernel) - mu12

    s = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )
    return s.mean()
