import time, jax, jax.numpy as jnp
key = jax.random.PRNGKey(0)

def bench(name, f, *args, n=5):
    out = f(*args); v = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args); v = float(jnp.asarray(out).ravel()[0])
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

# row gathers: [M] rows of width W from [R, W]
for (rows, width, m) in [(100_000, 128, 1_000_000), (100_000, 8, 1_000_000),
                         (100_000, 128, 4_000_000)]:
    emb = jax.random.normal(key, (rows, width))
    idx = jax.random.randint(key, (m,), 0, rows)
    f = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum(axis=0))
    bench(f"row gather [{m}] x width {width}", f, emb, idx)

# element gather baseline at 1M and 4M
for m in (1_000_000, 4_000_000):
    emb = jax.random.normal(key, (12_000_000,))
    idx = jax.random.randint(key, (m,), 0, 12_000_000)
    f = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
    bench(f"elem gather [{m}]", f, emb, idx)

# sorted-indices element gather
m = 4_000_000
emb = jax.random.normal(key, (12_000_000,))
idx = jnp.sort(jax.random.randint(key, (m,), 0, 12_000_000))
f = jax.jit(lambda e, i: jnp.take(e, i, axis=0, indices_are_sorted=True).sum())
bench(f"sorted elem gather [{m}]", f, emb, idx)
