"""Is gsplat-style sort-based tile binning viable on TPU?

Measures: lax.sort throughput at candidate-list sizes (0.25M-2M keys,
1 and 2 operands + payload), approx_max_k cost scaling in k, and
cumsum/segment machinery costs. Readback-forced, scan-amortized.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(name, fn, arg, iters=4):
    def runner(kk):
        @jax.jit
        def go(m):
            def body(acc, _):
                return acc + fn(m + acc * 1e-20), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=kk)
            return acc
        return go

    try:
        lo, hi = runner(1), runner(9)
        _ = float(lo(arg)); _ = float(hi(arg))

        def t(g):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(arg))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


rng = np.random.default_rng(0)

for m in (262_144, 1_048_576, 2_097_152):
    keys = jnp.asarray(rng.uniform(0, 1e6, m).astype(np.float32))
    timed(f"lax.sort 1-key f32 M={m}",
          lambda x: jnp.sum(jax.lax.sort(x)[:8]), keys)
    payload = jnp.arange(m, dtype=jnp.int32)
    timed(f"sort key+payload M={m}",
          lambda x: jnp.sum(jax.lax.sort((x, payload), num_keys=1)[1][:8] * 1.0),
          keys)
    tile = jnp.asarray(rng.integers(0, 1024, m).astype(np.int32))
    timed(f"sort 2-key (tile,depth)+payload M={m}",
          lambda x: jnp.sum(jax.lax.sort(
              (tile, x, payload), num_keys=2)[2][:8] * 1.0), keys)
    # fused single-key u32: tile<<20 | depth-rank
    timed(f"argsort fused-key i32 M={m}",
          lambda x: jnp.sum(jnp.argsort(
              tile * 1048576 + x.astype(jnp.int32) % 1048576)[:8] * 1.0),
          keys)

# approx_max_k scaling in k at [64, 100k]
big = jnp.asarray(rng.uniform(0, 1, (64, 100_000)).astype(np.float32))
for k in (128, 256, 512, 1024):
    timed(f"approx_max_k k={k} on [64,100k] x16",
          lambda x, k=k: sum(
              jax.lax.approx_max_k(x + i * 1e-9, k)[0].sum()
              for i in range(16)), big, iters=3)
    timed(f"lax.top_k    k={k} on [64,100k] x16",
          lambda x, k=k: sum(
              jax.lax.top_k(x + i * 1e-9, k)[0].sum()
              for i in range(2)) * 8, big, iters=3)

# segment machinery: searchsorted + cummax id recovery at 512k
m = 524_288
pos = jnp.arange(m, dtype=jnp.int32)
offs = jnp.asarray(np.sort(rng.integers(0, m, 1024)).astype(np.int32))
timed("cummax segment-id recovery 512k",
      lambda x: jnp.sum(jax.lax.cummax(
          jnp.zeros(m, jnp.int32).at[offs].max(jnp.arange(1024, dtype=jnp.int32))
      )[:8] * 1.0 + x * 0), keys[:1])
