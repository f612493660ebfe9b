"""Probe 2: what 2D gather does Mosaic support, and how fast is it?

Strategy under test for arbitrary-index table gathers inside Pallas:
  flat index f -> (hi, lo) = (f // 128, f % 128)
  step 1: dynamic_gather along sublanes: rows[i, :] = tbl2d[hi_i, :]
          (indices broadcast across lanes)
  step 2: lane select: out[i] = sum_j rows[i, j] * (j == lo_i)
Effective element-gather throughput = rows fetched per second.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 4096            # table sublanes (4096*128 = 2^19 elements)
ROWS = S * 128
N = 131072 * 8      # total element gathers per call (points*corners)
BLK = 512           # element gathers per kernel block (one per sublane)


def timeit(name, fn, *args, iters=8):
    try:
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:240]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms   {N/dt/1e6:8.1f} M elems/s")
    return dt


key = jax.random.PRNGKey(0)
tbl2d = jax.random.normal(key, (S, 128), dtype=jnp.float32)
flat_idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, ROWS,
                              dtype=jnp.int32)

# XLA baseline at this size
timeit("xla take flat [N]", jax.jit(
    lambda t, i: jnp.take(t.reshape(-1), i, axis=0)), tbl2d, flat_idx)


# --- A: take_along_axis axis=0, indices [BLK, 128] ---
def kern_a(tbl_ref, hi_ref, lo_ref, out_ref):
    rows = jnp.take_along_axis(tbl_ref[:], hi_ref[0], axis=0)  # [BLK,128]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
    out_ref[0] = jnp.sum(jnp.where(lanes == lo_ref[0], rows, 0.0), axis=1,
                         keepdims=True)


@jax.jit
def pallas_a(tbl2d, flat_idx):
    hi = (flat_idx // 128).reshape(N // BLK, BLK)
    lo = (flat_idx % 128).reshape(N // BLK, BLK)
    # broadcast hi across lanes: [blocks, BLK, 128]
    hi_b = jnp.broadcast_to(hi[:, :, None], (N // BLK, BLK, 128))
    lo_b = jnp.broadcast_to(lo[:, :, None], (N // BLK, BLK, 128))
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((N // BLK, BLK, 1), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, hi_b, lo_b)


timeit("pallas row-gather + lane-select", pallas_a, tbl2d, flat_idx)


# --- B: same but compute hi/lo broadcast inside the kernel (less HBM) ---
def kern_b(tbl_ref, idx_ref, out_ref):
    f = idx_ref[0]                      # [BLK, 1] int32
    hi = f // 128
    lo = f % 128
    hi_b = jnp.broadcast_to(hi, (BLK, 128))
    rows = jnp.take_along_axis(tbl_ref[:], hi_b, axis=0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
    out_ref[0] = jnp.sum(jnp.where(lanes == lo, rows, 0.0), axis=1,
                         keepdims=True)


@jax.jit
def pallas_b(tbl2d, flat_idx):
    idx = flat_idx.reshape(N // BLK, BLK, 1)
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((N // BLK, BLK, 1), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, idx)


timeit("pallas row-gather (idx math in kernel)", pallas_b, tbl2d, flat_idx)


# --- C: two-level: gather along lanes then sublanes? (lane-dim gather) ---
def kern_c(tbl_ref, idx_ref, out_ref):
    # gather along lanes: out[i, j] = tbl[i, idx[i, j]] — row fixed per
    # sublane. Useful if a second pass exists; probe support + speed only.
    out_ref[0] = jnp.take_along_axis(
        tbl_ref[0:8, :], idx_ref[0] % 128, axis=1)


@jax.jit
def pallas_c(tbl2d, flat_idx):
    idx = flat_idx.reshape(N // (8 * 128), 8, 128)
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((N // (8 * 128), 8, 128), jnp.float32),
        grid=(N // (8 * 128),),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, idx)


timeit("pallas lane-dim gather (support probe)", pallas_c, tbl2d, flat_idx)
