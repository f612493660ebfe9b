import time, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
M = 16 * 8 * 131072  # gathers per hash eval

def bench(rows, dtype=jnp.float32):
    emb = jax.random.normal(key, (rows,), dtype=dtype)
    idx = jax.random.randint(key, (M,), 0, rows)
    f = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
    v = float(f(emb, idx))
    t0 = time.perf_counter()
    for _ in range(5):
        v = float(f(emb, idx))
    dt = (time.perf_counter()-t0)/5
    print(f"rows={rows:>10} {str(dtype.dtype if hasattr(dtype,'dtype') else dtype):>8}: {dt*1000:7.1f} ms -> {M/dt/1e6:7.0f} M gathers/s", flush=True)

for rows in (12_300_000, 2_000_000, 500_000, 131_072, 32_768, 8_192):
    bench(rows)
bench(12_300_000, jnp.bfloat16)

# 2D table variant: [rows, 2] rows like actual hash table channels
emb2 = jax.random.normal(key, (2_000_000, 2))
idx2 = jax.random.randint(key, (16*8*131072,), 0, 2_000_000)
f2 = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
v = float(f2(emb2, idx2))
t0 = time.perf_counter()
for _ in range(5):
    v = float(f2(emb2, idx2))
print(f"[2M,2] 2ch rows: {(time.perf_counter()-t0)/5*1000:7.1f} ms", flush=True)
