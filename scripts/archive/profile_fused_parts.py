"""Attribute the fused-dual-encode cost at flagship shapes: build, forward,
backward — per dense_max_res. Run on the real TPU."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

from holoscene_tpu.ops.hashgrid import (
    HashGridMeta,
    build_quad_block_tables,
    hash_encode_fused_dual,
    init_hash_embeddings,
)


def timeit(fn, *args, iters=5, label=""):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dmr", type=int, default=256)
    ap.add_argument("--n", type=int, default=57344)
    args = ap.parse_args()

    meta = HashGridMeta(num_levels=16, level_dim=2, base_resolution=16,
                        log2_hashmap_size=19, desired_resolution=2048,
                        dense_max_res=args.dmr)
    print("table_rows", meta.table_rows)
    k = jax.random.PRNGKey(0)
    ka, kb, kx = jax.random.split(k, 3)
    ea = init_hash_embeddings(ka, meta)
    eb = init_hash_embeddings(kb, meta)
    x = jax.random.uniform(kx, (args.n, 3), minval=0.01, maxval=0.99)

    build = jax.jit(lambda a, b: build_quad_block_tables(a, b, meta))
    timeit(build, ea, eb, label="build_quad_block_tables")

    fwd = jax.jit(lambda x, a, b: hash_encode_fused_dual(x, a, b, meta))
    timeit(fwd, x, ea, eb, label="fused fwd (fa, Ja, fb)")

    def loss(x, a, b):
        fa, Ja, fb = hash_encode_fused_dual(x, a, b, meta)
        return fa.sum() + Ja.sum() + fb.sum()

    bwd = jax.jit(jax.grad(loss, argnums=(1, 2)))
    timeit(bwd, x, ea, eb, label="fused fwd+bwd (emb grads)")


if __name__ == "__main__":
    main()
