"""Probe 3: sublane-dim dynamic gather support + amortized timing.

The remote relay adds ~27-33 ms per host readback, so probe 2's numbers were
floor-dominated. Here every variant runs K times inside one jit (scan over
stacked index sets, carrying a sum) with a single readback; throughput uses
the K=17 vs K=1 delta.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 4096            # table sublanes (4096*128 = 2^19 = 524288 elements)
ROWS = S * 128
E = 131072 * 8      # element gathers per call (= 131072 pts x 8 corners)


def run_k(fn, tbl, idx_sets, k):
    """scan fn over k index sets, carry the running sum (defeats DCE/overlap
    illusions only partially — deltas between k values give steady rate)."""

    @jax.jit
    def go(tbl, idx_sets):
        def body(acc, idx):
            out = fn(tbl, idx)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, 0.0, idx_sets[:k])
        return acc

    return go


def throughput(name, fn, tbl, idx_sets, elems_per_call=E):
    try:
        lo = run_k(fn, tbl, idx_sets, 1)
        hi = run_k(fn, tbl, idx_sets, 17)
        _ = float(lo(tbl, idx_sets))
        _ = float(hi(tbl, idx_sets))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:220]}")
        return None

    def t(g, iters=6):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(g(tbl, idx_sets))
        return (time.perf_counter() - t0) / iters

    dt = (t(hi) - t(lo)) / 16.0
    print(f"{name:46s} {dt*1e3:8.2f} ms/call   "
          f"{elems_per_call/dt/1e6:8.0f} M elems/s")
    return dt


key = jax.random.PRNGKey(0)
tbl2d = jax.random.normal(key, (S, 128), dtype=jnp.float32)
K = 17
idx_sets = jax.random.randint(jax.random.PRNGKey(1), (K, E), 0, ROWS,
                              dtype=jnp.int32)

# ---- XLA baseline ----
throughput("xla take flat", lambda t, i: jnp.take(t.reshape(-1), i, axis=0),
           tbl2d, idx_sets)


# ---- A: one sublane-gather over the FULL table per 4096-elem block ----
def kern_full(tbl_ref, idx_ref, out_ref):
    f = idx_ref[0]                                  # [4096, 1]
    hi = jnp.broadcast_to(f // 128, (S, 128))
    rows = jnp.take_along_axis(tbl_ref[:], hi, axis=0)   # [4096,128]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    out_ref[0] = jnp.sum(jnp.where(lanes == f % 128, rows, 0.0), axis=1,
                         keepdims=True)


def pallas_full(tbl, idx):
    nblk = E // S
    return pl.pallas_call(
        kern_full,
        out_shape=jax.ShapeDtypeStruct((nblk, S, 1), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl, idx.reshape(nblk, S, 1))


throughput("pallas sublane-gather full-table", pallas_full, tbl2d, idx_sets)


# ---- B: chunked equal-shape sublane gather (512-sublane chunks) ----
CH = 512


def kern_chunk(tbl_ref, idx_ref, out_ref):
    f = idx_ref[0]                                  # [CH, 1]
    hi = f // 128
    lo = f % 128
    acc = jnp.zeros((CH, 128), jnp.float32)
    for c in range(S // CH):
        rel = hi - c * CH
        valid = (rel >= 0) & (rel < CH)
        g = jnp.broadcast_to(jnp.clip(rel, 0, CH - 1), (CH, 128))
        rows = jnp.take_along_axis(tbl_ref[pl.ds(c * CH, CH), :], g, axis=0)
        acc = acc + jnp.where(valid, rows, 0.0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
    out_ref[0] = jnp.sum(jnp.where(lanes == lo, acc, 0.0), axis=1,
                         keepdims=True)


def pallas_chunk(tbl, idx):
    nblk = E // CH
    return pl.pallas_call(
        kern_chunk,
        out_shape=jax.ShapeDtypeStruct((nblk, CH, 1), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl, idx.reshape(nblk, CH, 1))


throughput("pallas chunked sublane-gather", pallas_chunk, tbl2d, idx_sets)


# ---- C: pure lane-dim gather rate (no table semantics; upper bound) ----
def kern_lane(tbl_ref, idx_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(tbl_ref[0:512, :], idx_ref[0] % 128,
                                     axis=1)


def pallas_lane(tbl, idx):
    nblk = E // (512 * 128)
    return pl.pallas_call(
        kern_lane,
        out_shape=jax.ShapeDtypeStruct((nblk, 512, 128), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl, idx.reshape(nblk, 512, 128))


throughput("pallas lane-gather rate probe", pallas_lane, tbl2d, idx_sets)
