"""Viability probe: dynamic gather from a VMEM-resident table inside Pallas.

Question: can a Pallas kernel on v5e gather table rows with runtime indices
at better throughput than XLA's gather engine (~96-180M rows/s measured)?
Tries the obvious spellings; reports compile success + throughput for each.

Run on the TPU:  python scripts/probe_pallas_gather.py
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 2 ** 19          # one hashed level's table (f32-packed pairs): 2 MB
N = 131072              # points per call
CORNERS = 8
BLK = 2048              # points per kernel block


def timeit(name, fn, *args, iters=8):
    try:
        out = fn(*args)
        out = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(out).ravel()[0])
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    rows = N * CORNERS
    print(f"{name:40s} {dt*1e3:8.2f} ms   {rows/dt/1e6:8.1f} M rows/s")
    return dt


key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (ROWS,), dtype=jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (CORNERS, N), 0, ROWS,
                         dtype=jnp.int32)

# --- baseline: XLA take ---
xla_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
timeit("xla take [8,N]", xla_take, tbl, idx)


# --- pallas A: jnp.take inside kernel, full table in VMEM ---
def kern_take(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)


@jax.jit
def pallas_take(tbl, idx):
    return pl.pallas_call(
        kern_take,
        out_shape=jax.ShapeDtypeStruct((CORNERS, BLK), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((ROWS,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CORNERS, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CORNERS, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(tbl, idx)


timeit("pallas jnp.take (VMEM table)", pallas_take, tbl, idx)


# --- pallas B: table reshaped 2D [ROWS//128, 128]; gather via row+lane ---
def kern_take2d(tbl_ref, idx_ref, out_ref):
    flat = tbl_ref[:].reshape(-1)
    out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)


@jax.jit
def pallas_take2d(tbl, idx):
    return pl.pallas_call(
        kern_take2d,
        out_shape=jax.ShapeDtypeStruct((CORNERS, BLK), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((ROWS // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CORNERS, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CORNERS, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(tbl.reshape(ROWS // 128, 128), idx)


timeit("pallas take of 2D-tiled table", pallas_take2d, tbl, idx)
