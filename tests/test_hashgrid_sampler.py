import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.hashgrid import (
    HashGridMeta,
    build_dense_block_tables,
    dense_level_count,
    hash_encode,
    hash_encode_sampler,
    init_hash_embeddings,
)

META = HashGridMeta(num_levels=8, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=128)


def test_dense_level_count():
    # levels dense while res^3 <= 2^10=1024 -> res <= 10: res 4, 6(ceil 4*1.64) ...
    n = dense_level_count(META)
    res, sizes, _ = META.level_tables()
    for lvl in range(n):
        assert res[lvl] ** 3 <= sizes[lvl]
    if n < META.num_levels:
        assert res[n] ** 3 > sizes[n]


def test_level_range_matches_full():
    emb = init_hash_embeddings(jax.random.PRNGKey(0), META)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    full = hash_encode(x, emb, META, packed=False)
    lo, hi = 2, 6
    part = hash_encode(x, emb, META, packed=False, level_range=(lo, hi))
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full[:, lo * 2 : hi * 2]), atol=1e-7
    )


def test_sampler_encode_matches_reference_path():
    emb = init_hash_embeddings(jax.random.PRNGKey(0), META)
    blocks = build_dense_block_tables(emb, META)
    # keep points off the exact upper boundary (sampler clamps, canonical
    # mod-wraps there)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.0,
                           maxval=0.98)
    fast = hash_encode_sampler(x, emb, blocks, META)
    exact = hash_encode(x, emb, META, packed=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=3e-6)


def test_sampler_encode_truncated_levels():
    emb = init_hash_embeddings(jax.random.PRNGKey(0), META)
    blocks = build_dense_block_tables(emb, META)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), maxval=0.98)
    fast = hash_encode_sampler(x, emb, blocks, META, grid_levels=5)
    exact = hash_encode(x, emb, META, packed=True)[:, : 5 * 2]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=3e-6)


def test_sampler_encode_oob_zero():
    emb = init_hash_embeddings(jax.random.PRNGKey(0), META)
    blocks = build_dense_block_tables(emb, META)
    x = jnp.array([[1.5, 0.5, 0.5], [-0.2, 0.3, 0.3]])
    out = hash_encode_sampler(x, emb, blocks, META)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)
