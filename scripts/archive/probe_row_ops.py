"""Probe: wide-row gather/scatter throughput on the XLA gather engine.

Decides whether the render path should use 16-wide block-row gathers for
dense levels (backward = 16-wide row scatters + slicing transpose).
Scan-amortized timing (17 vs 1 calls), single readback.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

CELLS = 2 ** 19
N = 131072           # row ops per call


def throughput(name, fn, tbl, idx_sets, rows_per_call):
    def run_k(k):
        @jax.jit
        def go(tbl, idx_sets):
            def body(acc, idx):
                return acc + jnp.sum(fn(tbl, idx)), None
            acc, _ = jax.lax.scan(body, 0.0, idx_sets[:k])
            return acc
        return go

    try:
        lo, hi = run_k(1), run_k(17)
        _ = float(lo(tbl, idx_sets)); _ = float(hi(tbl, idx_sets))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return

    def t(g, iters=6):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(g(tbl, idx_sets))
        return (time.perf_counter() - t0) / iters

    dt = (t(hi) - t(lo)) / 16.0
    print(f"{name:44s} {dt*1e3:8.2f} ms/call  "
          f"{rows_per_call/dt/1e6:8.1f} M rows/s")


key = jax.random.PRNGKey(0)
idx_sets = jax.random.randint(jax.random.PRNGKey(1), (17, N), 0, CELLS,
                              dtype=jnp.int32)

for width in (1, 2, 8, 16, 32):
    tbl = jax.random.normal(key, (CELLS, width), dtype=jnp.float32)
    throughput(f"gather rows width={width}",
               lambda t_, i_, w=width: jnp.take(t_, i_, axis=0),
               tbl, idx_sets, N)

vals16 = jax.random.normal(key, (N, 16), dtype=jnp.float32)
throughput(
    "scatter-add rows width=16",
    lambda t_, i_: jnp.zeros((CELLS, 16), jnp.float32).at[i_].add(vals16),
    jnp.zeros((1,)), idx_sets, N,
)
vals1 = vals16[:, 0]
throughput(
    "scatter-add elements (width=1)",
    lambda t_, i_: jnp.zeros((CELLS,), jnp.float32).at[i_].add(vals1),
    jnp.zeros((1,)), idx_sets, N,
)
# 16 element scatters as the strawman alternative
def scatter16x1(t_, i_):
    out = jnp.zeros((CELLS * 16,), jnp.float32)
    base = i_ * 16
    for c in range(16):
        out = out.at[base + c].add(vals16[:, c])
    return out
throughput("16x element scatter (strawman)", scatter16x1,
           jnp.zeros((1,)), idx_sets, 16 * N)
