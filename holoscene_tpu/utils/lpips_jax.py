"""LPIPS (AlexNet backbone) in JAX, loaded from converted weights.

The reference's eval stack reports the PSNR/SSIM/LPIPS triple
(reference utils/eval_rgb.py:7-46, lpips-alex). The `lpips` torch package
and its pretrained weights are not installable in hermetic environments, so
this module evaluates the SAME network from a one-time weight export:

    python scripts/export_lpips_npz.py --out lpips_alex.npz   # where the
    # torch `lpips` package + weights exist (documented in the script)

and `HOLOSCENE_LPIPS_NPZ=/path/to/lpips_alex.npz` (or the default cache
path) makes `utils/eval_rgb.lpips_fn` use this implementation on any
backend — TPU included.

Architecture (lpips.LPIPS(net='alex'), v0.1 weights):
  * inputs in [-1, 1], normalized by the scaling layer
    (x - shift) / scale with the lpips constants;
  * torchvision AlexNet feature stack; taps at relu1..relu5
    (64/192/384/256/256 channels), maxpool(3,2) between taps 1-2 and 2-3;
  * per-tap channel-unit-normalization, squared difference, non-negative
    1x1 linear weights, spatial mean, summed over the 5 taps.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_ch, in_ch, kernel, stride, pad, maxpool_before)
_ALEX_CONVS = (
    (64, 3, 11, 4, 2, False),
    (192, 64, 5, 1, 2, True),
    (384, 192, 3, 1, 1, True),
    (256, 384, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
)


def init_random_params(seed: int = 0) -> dict:
    """Random-weight parameter pytree with the exact lpips-alex shapes —
    for conversion tests and smoke paths (NOT a perceptual metric)."""
    rng = np.random.default_rng(seed)
    params: dict = {}
    for i, (out_c, in_c, k, _s, _p, _mp) in enumerate(_ALEX_CONVS):
        params[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_c, in_c, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.01, (out_c,)).astype(np.float32)
        params[f"lin{i}_w"] = rng.uniform(
            0, 0.2, (out_c,)).astype(np.float32)
    return params


def load_lpips_npz(path: str) -> dict:
    """Load a weight export produced by scripts/export_lpips_npz.py."""
    with np.load(path) as z:
        params = {k: np.asarray(z[k], np.float32) for k in z.files}
    for i, (out_c, in_c, k, _s, _p, _mp) in enumerate(_ALEX_CONVS):
        assert params[f"conv{i}_w"].shape == (out_c, in_c, k, k), (
            i, params[f"conv{i}_w"].shape)
        assert params[f"lin{i}_w"].shape == (out_c,), i
    return params


def _maxpool_3x3_s2(x):
    # torch MaxPool2d(3, 2): no padding, floor sizing
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID")


def _features(params, x):
    """x [B, 3, H, W] in [-1, 1] -> list of 5 tap activations."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE)[None, :, None, None]
    taps = []
    for i, (_o, _i, _k, s, p, mp) in enumerate(_ALEX_CONVS):
        if mp:
            x = _maxpool_3x3_s2(x)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(params[f"conv{i}_w"]),
            window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + jnp.asarray(params[f"conv{i}_b"])[None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    # lpips.normalize_tensor: x / (||x||_ch + eps)
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


@partial(jax.jit, static_argnums=())
def lpips_pair(params: dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    ta = jnp.transpose(a, (2, 0, 1))[None] * 2.0 - 1.0
    tb = jnp.transpose(b, (2, 0, 1))[None] * 2.0 - 1.0
    fa = _features(params, ta)
    fb = _features(params, tb)
    total = jnp.zeros(())
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
        w = jnp.asarray(params[f"lin{i}_w"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total


_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "holoscene", "lpips_alex.npz")


def lpips_from_npz(path: str | None = None):
    """Returns lpips(a_hwc01, b_hwc01) -> float backed by the JAX
    implementation, or None when no weight file is found. Resolution order:
    explicit arg, $HOLOSCENE_LPIPS_NPZ, ~/.cache/holoscene/lpips_alex.npz."""
    path = path or os.environ.get("HOLOSCENE_LPIPS_NPZ") or _DEFAULT_CACHE
    if not os.path.exists(path):
        return None
    params = load_lpips_npz(path)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def fn(a, b):
        return float(lpips_pair(
            params, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))

    return fn
