import time, sys, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, "/root/repo")

key = jax.random.PRNGKey(0)

def bench(name, f, *args, n=5):
    t0 = time.perf_counter()
    out = f(*args); v = float(jnp.asarray(out).ravel()[0])
    print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args); v = float(jnp.asarray(out).ravel()[0])
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

ROWS = 12_300_000
emb = jax.random.normal(key, (ROWS,))
idx = jax.random.randint(key, (16, 8, 131072), 0, ROWS)
f_gather = jax.jit(lambda e, i: jnp.take(e, i, axis=0).sum(axis=(0,1)))
bench("A gather [16,8,131k] from 12.3M", f_gather, emb, idx)

z = jax.random.uniform(key, (1024, 768))
f_sort = jax.jit(lambda x: jnp.take_along_axis(x, jnp.argsort(x, axis=-1), axis=-1).sum(axis=-1))
bench("B argsort+gather [1024,768]", f_sort, z)

cdf = jnp.sort(jax.random.uniform(key, (1024, 641)), axis=-1)
u = jax.random.uniform(key, (1024, 128))
f_ss = jax.jit(lambda c, uu: jax.vmap(partial(jnp.searchsorted, side="right"))(c, uu).sum(axis=-1))
bench("C vmapped searchsorted [1024,641]x128", f_ss, cdf, u)

x = jax.random.normal(key, (131072, 71))
w1 = jax.random.normal(key, (71, 256)); w2 = jax.random.normal(key, (256, 256)); w3 = jax.random.normal(key, (256, 288))
f_mlp = jax.jit(lambda a: (jax.nn.softplus(jax.nn.softplus(a @ w1) @ w2) @ w3).sum(axis=0))
bench("E mlp fwd [131k, 71-256-256-288]", f_mlp, x)

fe = jax.random.uniform(key, (1024, 640))
f_cum = jax.jit(lambda a: jnp.cumsum(a, axis=-1).sum(axis=-1))
bench("D cumsum [1024,640]", f_cum, fe)
