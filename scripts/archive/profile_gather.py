"""Microbench: hash-table gather strategies on TPU."""
import time
import jax, jax.numpy as jnp

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

key = jax.random.PRNGKey(0)
ROWS = 6_000_000
M = 131_072 * 16 * 8  # points x levels x corners

emb2 = jax.random.normal(key, (ROWS, 2))
idx = jax.random.randint(key, (M,), 0, ROWS)

f_a = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
timeit(f"a) take [rows,2] idx[{M}]", f_a, emb2, idx, n=3)

# b) 128-lane rows: 64 entries of 2ch per row
emb128 = jax.random.normal(key, (ROWS // 64, 128))
row_idx = idx // 64
f_b = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
timeit("b) take [rows/64,128] row gather only", f_b, emb128, row_idx, n=3)

# c) full b) with in-row select via one-hot einsum
def c_fn(e, i):
    rows = jnp.take(e, i // 64, axis=0)           # [M,128]
    sub = i % 64
    onehot = jax.nn.one_hot(sub, 64, dtype=e.dtype)  # [M,64]
    pair = rows.reshape(-1, 64, 2)
    return jnp.einsum("mkc,mk->mc", pair, onehot).sum()
timeit("c) row gather + one-hot select", jax.jit(c_fn), emb128, idx, n=3)

# d) 8-lane rows: 4 entries per row
emb8 = jax.random.normal(key, (ROWS // 4, 8))
f_d = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum())
timeit("d) take [rows/4,8] row gather only", f_d, emb8, idx // 4, n=3)

# e) bf16 table
emb2b = emb2.astype(jnp.bfloat16)
timeit("e) take [rows,2] bf16", f_a, emb2b, idx, n=3)

# f) smaller idx count (just final forward: no corners batched) for scaling
idx_small = idx[: M // 8]
timeit("f) take [rows,2] idx/8", f_a, emb2, idx_small, n=3)
