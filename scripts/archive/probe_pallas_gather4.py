"""Probe 4: the primitives that decide the fused hash-grid kernel design.

  1. XLA scatter-add throughput (backward's embedding-gradient cost).
  2. Pallas unrolled dynamic-slice ROW fetch: idx in SMEM, fetch [1,128]
     rows from a VMEM table into scratch sublanes, then lane-select.
  3. Wide-lane gather support: operand [8, 4096] gathered along axis=1.
  4. Small equal-shape sublane gather [8,128] axis=0 (curiosity).

Timing: scan-amortized (17 vs 1 calls), single readback per run.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 4096
ROWS = S * 128           # 2^19
E = 131072 * 8


def run_k(fn, args, k):
    @jax.jit
    def go(*args):
        def body(acc, idx):
            out = fn(args[0], idx)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, 0.0, args[1][:k])
        return acc
    return go


def throughput(name, fn, tbl, idx_sets, elems=E):
    try:
        lo = run_k(fn, (tbl, idx_sets), 1)
        hi = run_k(fn, (tbl, idx_sets), 17)
        _ = float(lo(tbl, idx_sets)); _ = float(hi(tbl, idx_sets))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None

    def t(g, iters=6):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(g(tbl, idx_sets))
        return (time.perf_counter() - t0) / iters

    dt = (t(hi) - t(lo)) / 16.0
    print(f"{name:46s} {dt*1e3:8.2f} ms/call   {elems/dt/1e6:8.0f} M elems/s")
    return dt


key = jax.random.PRNGKey(0)
tbl2d = jax.random.normal(key, (S, 128), dtype=jnp.float32)
K = 17
idx_sets = jax.random.randint(jax.random.PRNGKey(1), (K, E), 0, ROWS,
                              dtype=jnp.int32)

# ---- 1: XLA scatter-add (flat element scatter, duplicates present) ----
vals = jax.random.normal(jax.random.PRNGKey(2), (E,), dtype=jnp.float32)


def xla_scatter(tbl, idx):
    flat = jnp.zeros((ROWS,), jnp.float32)
    return flat.at[idx].add(vals)


throughput("xla scatter-add flat", xla_scatter, tbl2d, idx_sets)


# ---- 2: unrolled dynamic-slice row fetch ----
P = 256          # rows fetched per kernel block (unrolled)


def kern_rows(idx_smem, tbl_ref, lo_ref, out_ref, scratch):
    for i in range(P):
        scratch[i, :] = tbl_ref[pl.ds(idx_smem[i], 1), :][0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    out_ref[0] = jnp.sum(
        jnp.where(lanes == lo_ref[0], scratch[:], 0.0), axis=1, keepdims=True)


def pallas_rows(tbl, idx):
    nblk = E // P
    hi = (idx // 128).reshape(nblk, P)
    lo = (idx % 128).reshape(nblk, P, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 1), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, 128), jnp.float32)],
    )
    # scalar-prefetch arg must be indexable per block: flatten hi with a
    # per-block offset read — simplest: pass the full [nblk*P] array and
    # index with program_id
    return pl.pallas_call(
        _kern_rows_pid,
        out_shape=jax.ShapeDtypeStruct((nblk, P, 1), jnp.float32),
        grid_spec=grid_spec,
    )(hi.reshape(-1), tbl, lo)


def _kern_rows_pid(idx_smem, tbl_ref, lo_ref, out_ref, scratch):
    b = pl.program_id(0)
    for i in range(P):
        scratch[i, :] = tbl_ref[pl.ds(idx_smem[b * P + i], 1), :][0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    out_ref[0] = jnp.sum(
        jnp.where(lanes == lo_ref[0], scratch[:], 0.0), axis=1, keepdims=True)


throughput("pallas unrolled ds row fetch", pallas_rows, tbl2d, idx_sets)


# ---- 3: wide-lane gather [8, 4096] axis=1 ----
def kern_wide(tblw_ref, idx_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(tblw_ref[:], idx_ref[0] % 4096, axis=1)


def pallas_wide(tbl, idx):
    tblw = tbl.reshape(128, S)[:8, :]          # [8, 4096]
    nblk = E // (8 * 4096)
    return pl.pallas_call(
        kern_wide,
        out_shape=jax.ShapeDtypeStruct((nblk, 8, 4096), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((8, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 4096), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 4096), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tblw, idx.reshape(nblk, 8, 4096))


throughput("pallas wide-lane gather [8,4096]", pallas_wide, tbl2d, idx_sets)


# ---- 4: small sublane gather [8,128] axis=0 ----
def kern_sub8(tbl_ref, idx_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(tbl_ref[0:8, :], idx_ref[0] % 8, axis=0)


def pallas_sub8(tbl, idx):
    nblk = E // (8 * 128)
    return pl.pallas_call(
        kern_sub8,
        out_shape=jax.ShapeDtypeStruct((nblk, 8, 128), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tbl, idx.reshape(nblk, 8, 128))


throughput("pallas sublane gather [8,128] axis=0", pallas_sub8, tbl2d,
           idx_sets)
