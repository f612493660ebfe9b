"""Fused dual encode-with-jacobian (ops/hashgrid.py hash_encode_fused_dual,
exact-f32 raw-take fetches) and the extended-dense capacity knob
(HashGridMeta.dense_max_res).

Parity targets: the exact unpacked path (`hash_encode(packed=False)`) for
features, `jacfwd` of it for the jacobian, and full AD through it for the
custom VJP — i.e. the semantics the reference implements in
hashencoder/src/hashencoder.cu:104-596 (forward / backward / second-order
backward kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from holoscene_tpu.ops.hashgrid import (
    HashGridMeta,
    _fused_level_split,
    hash_encode,
    hash_encode_fused_dual,
    init_hash_embeddings,
)


def _meta(dense_max_res: int) -> HashGridMeta:
    return HashGridMeta(
        num_levels=6, level_dim=2, base_resolution=4, log2_hashmap_size=8,
        desired_resolution=48, dense_max_res=dense_max_res,
    )


def _setup(dense_max_res: int, n: int = 157):
    meta = _meta(dense_max_res)
    ka, kb, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    ea = init_hash_embeddings(ka, meta, std=0.5)
    eb = init_hash_embeddings(kb, meta, std=0.5)
    x = jax.random.uniform(kx, (n, 3), minval=0.01, maxval=0.99)
    return meta, ea, eb, x


def test_dense_max_res_reshapes_tables():
    m0, m256 = _meta(0), _meta(256)
    r0 = _fused_level_split(m0)
    r256 = _fused_level_split(m256)
    assert r256[4] == m256.num_levels  # all levels dense at 256 for res<=48
    assert r0[4] < m0.num_levels
    assert m256.table_rows == int((r256[0].astype(np.int64) ** 3).sum())


@pytest.mark.parametrize("dmr", [0, 64])
def test_fused_features_match_packed_encode(dmr):
    meta, ea, eb, x = _setup(dmr)
    fa, Ja, fb = hash_encode_fused_dual(x, ea, eb, meta)
    ra = hash_encode(x, ea, meta, packed=False)
    rb = hash_encode(x, eb, meta, packed=False)
    np.testing.assert_allclose(fa, ra, atol=1e-6)
    np.testing.assert_allclose(fb, rb, atol=1e-6)


@pytest.mark.parametrize("dmr", [0, 64])
def test_fused_jacobian_matches_jacfwd(dmr):
    meta, ea, eb, x = _setup(dmr, n=41)
    _, Ja, _ = hash_encode_fused_dual(x, ea, eb, meta)
    Jref = jax.vmap(
        jax.jacfwd(lambda p: hash_encode(p[None], ea, meta, packed=False)[0])
    )(x)  # [N, F, 3]
    scale = float(jnp.abs(Jref).max())
    np.testing.assert_allclose(
        jnp.transpose(Ja, (2, 0, 1)), Jref, atol=2e-4 * max(scale, 1.0)
    )


@pytest.mark.parametrize("dmr", [0, 64])
@pytest.mark.parametrize("fetch", ["raw", "packed"])
def test_fused_vjp_matches_autodiff(dmr, fetch):
    """grad of a loss touching feats_a, J_a and feats_b w.r.t. (x, ea, eb)
    matches AD through the unfused path — covers the fused single-scatter
    backward AND the second-order ct_x path, for both fetch styles (packed
    bf16-rounds values, so its tolerance is the bf16 quantum)."""
    meta, ea, eb, x = _setup(dmr, n=37)
    r1 = jax.random.normal(jax.random.PRNGKey(5), (x.shape[0], meta.output_dim))
    r2 = jax.random.normal(jax.random.PRNGKey(6), (meta.output_dim, 3, x.shape[0]))
    r3 = jax.random.normal(jax.random.PRNGKey(7), (x.shape[0], meta.output_dim))

    def loss_fused(x, ea, eb):
        fa, Ja, fb = hash_encode_fused_dual(x, ea, eb, meta, fetch)
        return (fa * r1).sum() + (Ja * r2).sum() + (fb * r3).sum()

    def loss_ref(x, ea, eb):
        fa = hash_encode(x, ea, meta, packed=False)
        fb = hash_encode(x, eb, meta, packed=False)
        Jref = jax.vmap(
            jax.jacfwd(lambda p: hash_encode(p[None], ea, meta, packed=False)[0])
        )(x)
        return (
            (fa * r1).sum()
            + (jnp.transpose(Jref, (1, 2, 0)) * r2).sum()
            + (fb * r3).sum()
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ea, eb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ea, eb)
    tol = 3e-6 if fetch == "raw" else 5e-3   # bf16 rounding of values
    for a, b in zip(g1, g2):
        s = float(jnp.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol * max(s, 1.0))


def test_sampled_color_bwd_unbiased_and_selective():
    """color_bwd='sampled' (packed fetch): table b's hashed-level gradient is
    a one-corner importance-sampled estimator. Checks: (1) table a's grad and
    table b's DENSE-level rows stay exactly equal to the exact path for any
    seed; (2) the seed-mean of table b's hashed rows converges to the exact
    gradient (unbiasedness)."""
    meta, ea, eb, x = _setup(0, n=29)
    _, _, offsets_np, _, Ld, _, _, _ = _fused_level_split(meta)
    dense_rows = int(offsets_np[Ld])
    assert 0 < Ld < meta.num_levels  # need both dense and hashed levels
    r1 = jax.random.normal(jax.random.PRNGKey(5), (x.shape[0], meta.output_dim))
    r3 = jax.random.normal(jax.random.PRNGKey(7), (x.shape[0], meta.output_dim))

    def loss(xx, ea_, eb_, seed, mode):
        fa, Ja, fb = hash_encode_fused_dual(
            xx, ea_, eb_, meta, "packed", seed=seed, color_bwd=mode
        )
        return (fa * r1).sum() + (fb * r3).sum()

    def grads(seed, mode):
        return jax.grad(loss, argnums=(1, 2))(x, ea, eb, seed, mode)

    ga_ex, gb_ex = grads(jnp.float32(0.0), "exact")

    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(11), (384,), dtype=jnp.uint32),
        jnp.float32,
    )
    ga_s, gb_s = jax.jit(
        jax.vmap(lambda s: grads(s, "sampled"))
    )(seeds)

    # (1) table a exact for every seed; dense rows of b exact for every seed
    np.testing.assert_allclose(
        ga_s, jnp.broadcast_to(ga_ex, ga_s.shape), atol=1e-6
    )
    np.testing.assert_allclose(
        gb_s[:, :dense_rows],
        jnp.broadcast_to(gb_ex[:dense_rows], gb_s[:, :dense_rows].shape),
        atol=1e-6,
    )

    # (2) hashed rows: unbiased — the seed-mean approaches the exact grad
    mean_h = gb_s[:, dense_rows:].mean(axis=0)
    ref_h = gb_ex[dense_rows:]
    scale = float(jnp.abs(ref_h).max())
    np.testing.assert_allclose(mean_h, ref_h, atol=0.12 * max(scale, 1.0))
    # and a single draw is NOT the exact grad (it really samples)
    assert float(jnp.abs(gb_s[0, dense_rows:] - ref_h).max()) > 1e-4


def test_sampled_all_bwd_unbiased_for_sdf_table():
    """color_bwd='sampled_all': table a's hashed-level gradient (which
    carries the fused second-order jacobian cotangent, signed) is drawn
    ~ |cotangent| with the exact normalizer — seed-mean must converge to
    the exact gradient; dense rows stay exact per-seed."""
    meta, ea, eb, x = _setup(0, n=29)
    _, _, offsets_np, _, Ld, _, _, _ = _fused_level_split(meta)
    dense_rows = int(offsets_np[Ld])
    r1 = jax.random.normal(jax.random.PRNGKey(5), (x.shape[0], meta.output_dim))
    r2 = jax.random.normal(
        jax.random.PRNGKey(6), (meta.output_dim, 3, x.shape[0])
    )
    r3 = jax.random.normal(jax.random.PRNGKey(7), (x.shape[0], meta.output_dim))

    def loss(xx, ea_, eb_, seed, mode):
        fa, Ja, fb = hash_encode_fused_dual(
            xx, ea_, eb_, meta, "packed", seed=seed, color_bwd=mode
        )
        # touch the jacobian so table a's cotangent has second-order terms
        return (fa * r1).sum() + (Ja * r2).sum() + (fb * r3).sum()

    def grads(seed, mode):
        return jax.grad(loss, argnums=(1, 2))(x, ea, eb, seed, mode)

    ga_ex, gb_ex = grads(jnp.float32(0.0), "exact")
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(13), (768,), dtype=jnp.uint32),
        jnp.float32,
    )
    ga_s, gb_s = jax.jit(jax.vmap(lambda s: grads(s, "sampled_all")))(seeds)

    # dense rows exact per-seed for BOTH tables
    np.testing.assert_allclose(
        ga_s[:, :dense_rows],
        jnp.broadcast_to(ga_ex[:dense_rows], ga_s[:, :dense_rows].shape),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        gb_s[:, :dense_rows],
        jnp.broadcast_to(gb_ex[:dense_rows], gb_s[:, :dense_rows].shape),
        atol=1e-5,
    )
    # hashed rows: seed-mean converges (|ct|-IS has higher variance than
    # the weight-Bernoulli, hence more seeds + a looser tolerance)
    for g_s, g_ex in ((ga_s, ga_ex), (gb_s, gb_ex)):
        mean_h = g_s[:, dense_rows:].mean(axis=0)
        ref_h = g_ex[dense_rows:]
        scale = float(jnp.abs(ref_h).max())
        np.testing.assert_allclose(mean_h, ref_h, atol=0.15 * max(scale, 1.0))
        assert float(jnp.abs(g_s[0, dense_rows:] - ref_h).max()) > 1e-4


def test_sampled_color_bwd_guards():
    meta, ea, eb, x = _setup(0, n=7)
    with pytest.raises(ValueError):
        hash_encode_fused_dual(x, ea, eb, meta, "raw", color_bwd="sampled")
    with pytest.raises(ValueError):
        hash_encode_fused_dual(x, ea, eb, meta, "packed", color_bwd="typo")


def test_fused_oob_zeroed():
    meta, ea, eb, _ = _setup(64)
    x = jnp.array([[1.5, 0.5, 0.5], [0.2, 0.3, 0.4], [-0.1, 0.2, 0.3]])
    fa, Ja, fb = hash_encode_fused_dual(x, ea, eb, meta)
    assert float(jnp.abs(fa[0]).max()) == 0.0
    assert float(jnp.abs(fa[2]).max()) == 0.0
    assert float(jnp.abs(Ja[:, :, 0]).max()) == 0.0
    assert float(jnp.abs(fb[0]).max()) == 0.0
    assert float(jnp.abs(fa[1]).max()) > 0.0

    # oob gradient contributions must vanish
    g = jax.grad(lambda e: hash_encode_fused_dual(x[:1], e, eb, meta)[0].sum())(ea)
    assert float(jnp.abs(g).max()) == 0.0


@pytest.mark.parametrize("dmr", [0, 64])
def test_get_outputs_fused_matches_reference_path(dmr):
    from holoscene_tpu.models.fields import (
        ImplicitNetworkConfig,
        implicit_get_outputs,
        implicit_get_outputs_fused,
        init_implicit_network,
    )

    cfg = ImplicitNetworkConfig(
        feature_vector_size=32, d_out=4, dims=(32, 32), multires=2,
        num_levels=6, level_dim=2, base_size=4, end_size=48, logmap=8,
        color_grid_feature=True, divide_factor=1.1, dense_max_res=dmr,
    )
    params = init_implicit_network(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (97, 3), minval=-0.9,
                           maxval=0.9)
    o1 = implicit_get_outputs(params, cfg, x)
    o2 = implicit_get_outputs_fused(params, cfg, x)
    for name, a, b in zip(("sdf", "feat", "grad", "sem", "raw"), o1, o2):
        s = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(a, b, atol=1e-4 * s, err_msg=name)

    def loss(p, fn):
        sdf, fv, g, sem, raw = fn(p, cfg, x)
        return (
            (sdf ** 2).mean() + (fv ** 2).mean()
            + ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()
            + (sem ** 2).mean()
        )

    g1 = jax.grad(lambda p: loss(p, implicit_get_outputs))(params)
    g2 = jax.grad(lambda p: loss(p, implicit_get_outputs_fused))(params)
    f1, _ = ravel_pytree(g1)
    f2, _ = ravel_pytree(g2)
    s = float(jnp.abs(f1).max())
    np.testing.assert_allclose(f1, f2, atol=1e-4 * max(s, 1.0))


def test_train_step_runs_with_fused_mode():
    """Full train step with forward_grad_mode='fused' + dense_max_res: one
    step executes, finite loss, grid grads flow."""
    import dataclasses

    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    cfg = dataclasses.replace(
        cfg, forward_grad_mode="fused",
        implicit=dataclasses.replace(cfg.implicit, dense_max_res=32),
    )
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 100)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, lcfg := LossConfig(), optimizer)

    n_rays = 32
    rng = np.random.default_rng(0)
    batch = {
        "uv": jnp.asarray(rng.uniform(0, 32, (n_rays, 2)), jnp.float32),
        "pose": jnp.eye(4),
        "intrinsics": jnp.asarray(
            [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], jnp.float32
        ),
        "rgb": jnp.full((n_rays, 3), 0.5),
        "depth": jnp.ones((n_rays, 1)),
        "normal": jnp.tile(jnp.asarray([[0.0, 0, -1]]), (n_rays, 1)),
        "segs": jnp.zeros((n_rays,), jnp.int32),
        "mask": jnp.ones((n_rays, 1)),
    }
    # geometric init zeroes the first-layer weights on grid channels, so the
    # SDF grid's gradient is mathematically zero at step 0 (same as the
    # reference); it flows once lin0 moves — run a few steps
    p0_grid = np.asarray(params["implicit"]["grid"])
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, k, batch, i, call_reg=True, with_bg=False,
        )
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(np.asarray(params["implicit"]["grid"]) - p0_grid).max() > 0
