import time
import numpy as np
import jax, jax.numpy as jnp
from holoscene_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_embeddings

META = HashGridMeta(num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=19, desired_resolution=2048)
key = jax.random.PRNGKey(0)
emb = init_hash_embeddings(key, META)
N = 131072
xs = [jax.random.uniform(jax.random.PRNGKey(i), (N, 3)) for i in range(8)]

f = jax.jit(lambda e, xx: hash_encode(xx, e, META))
_ = np.asarray(f(emb, xs[0]))

t0 = time.perf_counter()
for i in range(8):
    out = f(emb, xs[i])
    s = float(out[0, 0])   # force full materialization of one element
print(f"with scalar readback: {(time.perf_counter()-t0)/8*1000:.2f} ms/call")

# chain calls so each depends on previous (defeats any concurrency illusions)
t0 = time.perf_counter()
out = xs[0]
g = jax.jit(lambda e, xx: hash_encode(xx[:, :3] * 0.999, e, META))
for i in range(8):
    out = g(emb, out[:, :3] if out.shape[1] >= 3 else xs[i])
jax.block_until_ready(out)
print(f"chained: {(time.perf_counter()-t0)/8*1000:.2f} ms/call")
