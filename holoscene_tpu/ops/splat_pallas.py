"""Pallas TPU kernel: per-tile front-to-back gaussian compositing.

The pure-JAX tile renderer (ops/splat.py) materializes [tiles, K, pixels]
alpha/transmittance tensors in HBM (~33 MB per tile chunk at K=512). This
kernel keeps the whole compositing loop in VMEM and on the MXU: each grid
program owns one tile and walks its K depth-sorted gaussians in chunks of
128 along the LANE dimension —

  * alpha for a chunk is one [P, 128] VPU broadcast (pixels in sublanes,
    gaussians in lanes);
  * the within-chunk exclusive transmittance cumprod is a log-space cumsum
    expressed as a [P,128] x [128,128] strictly-lower-triangular matmul
    (MXU), carried across chunks by a running [P,1] transmittance;
  * color/depth accumulation is a second [P,128] x [128,4] matmul.

No dynamic scalar indexing (Mosaic requires lane starts provably divisible
by 128, which the chunk layout guarantees). Used for inference/eval renders;
training uses the differentiable JAX renderer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_CHUNK = 128


def _composite_tile_kernel(xy_ref, conic_ref, rgbz_ref, op_ref, origin_ref,
                           out_ref, *, tile_size: int):
    """One program = one tile.

    Block shapes:
      xy     [1, 2, K]    (row 0 = x, row 1 = y)
      conic  [1, 4, K]    (rows a, b, c, pad)
      rgbz   [1, K, 4]    (r, g, b, depth)
      op     [1, 1, K]    (opacity * live)
      origin [1, 1, 2]    (SMEM)
      out    [1, P, 8]    (r, g, b, depth_sum, alpha, pad...)
    """
    p = tile_size * tile_size
    k_total = op_ref.shape[2]
    n_chunks = k_total // K_CHUNK

    pix_id = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).astype(jnp.float32)
    px = origin_ref[0, 0, 0] + (pix_id % tile_size) + 0.5  # [P, 1]
    py = origin_ref[0, 0, 1] + (pix_id // tile_size) + 0.5

    # strictly-lower-triangular ones: cumsum_exclusive along lanes via MXU
    row = jax.lax.broadcasted_iota(jnp.int32, (K_CHUNK, K_CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K_CHUNK, K_CHUNK), 1)
    lower = (row < col).astype(jnp.float32)

    def body(kc, carry):
        trans, acc = carry  # [P, 1], [P, 4]
        lo = pl.multiple_of(kc * K_CHUNK, K_CHUNK)
        gx = xy_ref[0, 0:1, pl.ds(lo, K_CHUNK)]  # [1, C]
        gy = xy_ref[0, 1:2, pl.ds(lo, K_CHUNK)]
        ca = conic_ref[0, 0:1, pl.ds(lo, K_CHUNK)]
        cb = conic_ref[0, 1:2, pl.ds(lo, K_CHUNK)]
        cc = conic_ref[0, 2:3, pl.ds(lo, K_CHUNK)]
        op = op_ref[0, 0:1, pl.ds(lo, K_CHUNK)]
        rgbz = rgbz_ref[0, pl.ds(lo, K_CHUNK), :]  # [C, 4]

        dx = px - gx  # [P, C]
        dy = py - gy
        power = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy)
        a = jnp.minimum(0.999, op * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where(a >= 1.0 / 255.0, a, 0.0)  # [P, C]

        log1m = jnp.log1p(-a)
        cums = jnp.dot(log1m, lower, preferred_element_type=jnp.float32)
        w = a * jnp.exp(cums) * trans  # [P, C]

        acc = acc + jnp.dot(w, rgbz, preferred_element_type=jnp.float32)
        trans = trans * jnp.exp(
            jnp.sum(log1m, axis=1, keepdims=True)
        )
        return trans, acc

    trans0 = jnp.ones((p, 1), jnp.float32)
    acc0 = jnp.zeros((p, 4), jnp.float32)
    trans, acc = jax.lax.fori_loop(0, n_chunks, body, (trans0, acc0))

    out = jnp.concatenate(
        [acc, 1.0 - trans, jnp.zeros((p, 3), jnp.float32)], axis=1
    )
    out_ref[0, :, :] = out


@partial(jax.jit, static_argnames=("tile_size", "interpret"))
def composite_tiles_pallas(
    g_xy: jnp.ndarray,      # [T, K, 2]
    g_conic: jnp.ndarray,   # [T, K, 3]
    g_rgb: jnp.ndarray,     # [T, K, 3]
    g_op: jnp.ndarray,      # [T, K]
    g_z: jnp.ndarray,       # [T, K]
    live: jnp.ndarray,      # [T, K] float (0/1)
    origins: jnp.ndarray,   # [T, 2] float tile pixel origins
    tile_size: int = 16,
    interpret: bool = False,
):
    """Returns (rgb [T, P, 3], depth [T, P] alpha-normalized, alpha [T, P]).

    NOTE alpha here is 1 - prod(1 - a_i) over ALL lanes — identical to the
    JAX renderer's sum of weights."""
    t, k = g_op.shape
    p = tile_size * tile_size
    pad = (-k) % K_CHUNK
    if pad:
        def padk(x, fill=0.0):
            shape = list(x.shape)
            shape[1] = pad
            return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=1)

        g_xy, g_conic, g_rgb, g_op, g_z, live = (
            padk(g_xy), padk(g_conic), padk(g_rgb), padk(g_op), padk(g_z),
            padk(live),
        )
        k += pad

    xy_t = jnp.swapaxes(g_xy, 1, 2)  # [T, 2, K]
    conic_t = jnp.concatenate(
        [jnp.swapaxes(g_conic, 1, 2), jnp.zeros((t, 1, k))], axis=1
    )  # [T, 4, K]
    rgbz = jnp.concatenate([g_rgb, g_z[..., None]], axis=-1)  # [T, K, 4]
    op = (g_op * live)[:, None, :]  # [T, 1, K]

    out = pl.pallas_call(
        partial(_composite_tile_kernel, tile_size=tile_size),
        out_shape=jax.ShapeDtypeStruct((t, p, 8), jnp.float32),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 2, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xy_t, conic_t, rgbz, op, origins[:, None, :])

    rgb = out[:, :, :3]
    depth_acc = out[:, :, 3]
    alpha = out[:, :, 4]
    return rgb, depth_acc / jnp.maximum(alpha, 1e-10), alpha
