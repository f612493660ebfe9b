"""NeRF-style sin/cos positional encoding.

Reference semantics: model/embedder.py:5-50 — include_input, log-sampled
frequency bands 2^0 .. 2^(multires-1), sin and cos per band per channel,
concatenated as [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...].
"""

from __future__ import annotations

import jax.numpy as jnp


def embedder_out_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """x: [..., D] -> [..., D*(1+2*multires)].

    Band order matches the reference (per-frequency: sin then cos), so
    feature layouts are interchangeable with the reference's MLP inputs.
    """
    if multires <= 0:
        return x
    feats = [x]
    for i in range(multires):
        freq = 2.0 ** i
        feats.append(jnp.sin(x * freq))
        feats.append(jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)
