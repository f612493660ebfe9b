"""N-minor layout hash encode vs current implementation."""
import time
import numpy as np
import jax, jax.numpy as jnp
from holoscene_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_embeddings, _PRIMES, _corner_indices

def timeit(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out

META = HashGridMeta(num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=19, desired_resolution=2048)
key = jax.random.PRNGKey(0)
emb = init_hash_embeddings(key, META)
N = 131072
x = jax.random.uniform(key, (N, 3))

f_old = jax.jit(lambda e, xx: hash_encode(xx, e, META))
out_old = timeit("old hash_encode [131k]", f_old, emb, x)

def hash_encode_nminor(inputs, emb_flat, meta):
    n, d = inputs.shape
    L, C = meta.num_levels, meta.level_dim
    res_np, sizes_np, offsets_np = meta.level_tables()
    scales = (np.exp2(np.arange(L) * np.log2(meta.per_level_scale)) * meta.base_resolution - 1.0).astype(np.float32)
    dense_np = (res_np.astype(np.int64) ** d) <= sizes_np.astype(np.int64)
    xT = inputs.T  # [D, N]
    oob = jnp.any((xT < 0) | (xT > 1), axis=0)  # [N]
    pos = scales[:, None, None] * xT[None]        # [L, D, N]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pg = pos_grid.astype(jnp.uint32)
    w = frac * frac * (3.0 - 2.0 * frac)          # [L, D, N]
    corners = _corner_indices(meta)               # [8, D] np
    res_j = jnp.asarray(res_np)[:, None]
    sizes_j = jnp.asarray(sizes_np)[:, None]
    offs_j = jnp.asarray(offsets_np)[:, None]
    dense_j = jnp.asarray(dense_np)[:, None]
    feats = []
    outs = []
    for k in range(corners.shape[0]):
        bits = corners[k]
        cg = pg + jnp.asarray(bits[:, None], dtype=jnp.uint32)[None]  # [L, D, N]
        dense_idx = cg[:, 0] + res_j * (cg[:, 1] + res_j * cg[:, 2])
        hash_idx = (cg[:, 0] * np.uint32(_PRIMES[0])) ^ (cg[:, 1] * np.uint32(_PRIMES[1])) ^ (cg[:, 2] * np.uint32(_PRIMES[2]))
        idx = jnp.where(dense_j, dense_idx, hash_idx) % sizes_j + offs_j   # [L, N]
        wk = jnp.prod(jnp.where(jnp.asarray(bits[:, None], bool)[None], w, 1.0 - w), axis=1)  # [L, N]
        base = idx.astype(jnp.int32) * C
        for ch in range(C):
            g = jnp.take(emb_flat, base + ch, axis=0)  # [L, N]
            outs.append(("k%dc%d" % (k, ch), wk * g))
    # accumulate per channel
    acc = [0.0] * C
    for (tag, v) in outs:
        ch = int(tag[-1])
        acc[ch] = acc[ch] + v
    feats = jnp.stack(acc, axis=1)  # [L, C, N]
    feats = jnp.where(oob[None, None, :], 0.0, feats)
    return feats.reshape(L * C, n).T

emb_flat = emb.reshape(-1)
f_new = jax.jit(lambda e, xx: hash_encode_nminor(xx, e, META))
out_new = timeit("n-minor hash_encode [131k]", f_new, emb_flat, x)
print("allclose:", bool(jnp.allclose(out_old, out_new, atol=1e-6)))
