"""Tiered fine levels (HoloSceneConfig.render_fine_top_f): the top-F
kept render samples get all hash levels, the tail only the coarse prefix
(zero-padded fine features). Parity targets: the untiered fused path when
the tail tier is empty-ish, manual prefix-encode math for the coarse
variant, and gradient flow into both table regions.

Offline error evidence on a trained checkpoint: PERF.md round-2
(scripts/probe_tiered_offline.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.models.fields import (
    ImplicitNetworkConfig,
    implicit_get_outputs_fused,
    init_implicit_network,
)
from holoscene_tpu.ops.hashgrid import hash_encode, prefix_meta


def _cfg(**kw):
    return ImplicitNetworkConfig(
        feature_vector_size=32, d_out=4, dims=(32, 32), multires=2,
        num_levels=6, level_dim=2, base_size=4, end_size=48, logmap=8,
        color_grid_feature=True, divide_factor=1.1, **kw,
    )


def test_coarse_levels_noop_and_prefix_semantics():
    cfg = _cfg()
    params = init_implicit_network(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (61, 3), minval=-0.9,
                           maxval=0.9)

    # coarse_levels == num_levels is a no-op
    o_full = implicit_get_outputs_fused(params, cfg, x)
    o_same = implicit_get_outputs_fused(params, cfg, x,
                                        coarse_levels=cfg.num_levels)
    for a, b in zip(o_full, o_same):
        np.testing.assert_allclose(a, b, atol=0)

    # coarse_levels=3: the color features equal the prefix encode, padded
    Lc = 3
    meta_c = prefix_meta(cfg.grid_meta, Lc)
    rc = meta_c.table_rows
    o_c = implicit_get_outputs_fused(params, cfg, x, coarse_levels=Lc)
    xn = x / cfg.divide_factor
    cf_manual = hash_encode((xn + 1.0) * 0.5, params["color_grid"][:rc],
                            meta_c, packed=True)
    # feature_vectors = color_map_mlp(padded cf); check via the padded input
    from holoscene_tpu.models.fields import _plain_linear_apply

    cf_pad = jnp.pad(cf_manual, ((0, 0), (0, (cfg.num_levels - Lc) * 2)))
    h = jax.nn.relu(
        _plain_linear_apply(params["color_map_mlp"]["lin0"], cf_pad)
    )
    fv_manual = _plain_linear_apply(params["color_map_mlp"]["lin1"], h)
    np.testing.assert_allclose(o_c[1], fv_manual, atol=1e-5)

    # fine-level table rows get ZERO gradient from the coarse call
    def loss(p):
        sdf, fv, g, sem, raw = implicit_get_outputs_fused(
            p, cfg, x, coarse_levels=Lc
        )
        return (sdf ** 2).mean() + (fv ** 2).mean() + (g ** 2).mean()

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["grid"][rc:]).max()) == 0.0
    assert float(jnp.abs(grads["color_grid"][rc:]).max()) == 0.0
    assert float(jnp.abs(grads["color_grid"][:rc]).max()) > 0.0


def _scene_cfg(**kw):
    from holoscene_tpu.losses.holoscene_loss import LossConfig  # noqa: F401
    from holoscene_tpu.models.fields import RenderingNetworkConfig
    from holoscene_tpu.models.holoscene import HoloSceneConfig
    from holoscene_tpu.ops.sampler import SamplerConfig

    base = dict(
        implicit=_cfg(),
        rendering=RenderingNetworkConfig(
            feature_vector_size=32, dims=(32, 32), multires_view=2,
            multires_point=2, multires_normal=2,
        ),
        sampler=SamplerConfig(N_samples=8, N_samples_eval=12,
                              N_samples_extra=4, beta_iters=3,
                              max_total_iters=2),
        use_bg_reg=False, sampler_grid_levels=4,
        forward_grad_mode="fused", render_top_m=10,
    )
    base.update(kw)
    return HoloSceneConfig(**base)


def test_render_rays_tiered_matches_untiered_when_tail_coarse_is_full():
    """F = M-2 leaves a 2-sample tail; with render_fine_levels close to
    num_levels the outputs stay near the untiered render, and with the
    default coarse prefix they remain finite with sane compositing."""
    from holoscene_tpu.models.holoscene import init_holoscene, render_rays

    cfg0 = _scene_cfg()
    params = init_holoscene(jax.random.PRNGKey(0), cfg0)
    R = 16
    key = jax.random.PRNGKey(3)
    rays_o = jnp.zeros((R, 3)) + jnp.asarray([0.1, 0.0, -0.2])
    rays_d = jax.nn.standardize(
        jax.random.normal(jax.random.PRNGKey(4), (R, 3)), axis=-1
    )
    dscale = jnp.ones((R, 1))
    w2c = jnp.eye(3)

    out0 = render_rays(params, cfg0, key, rays_o, rays_d, dscale, w2c,
                       training=True)
    cfg_t = dataclasses.replace(cfg0, render_fine_top_f=8,
                                render_fine_levels=5)
    out_t = render_rays(params, cfg_t, key, rays_o, rays_d, dscale, w2c,
                        training=True)
    # same sampler RNG -> same z; only 2 lowest-weight samples lose their
    # finest level. rgb must stay close; weights identical where est_w was
    np.testing.assert_allclose(out_t["z_vals"], out0["z_vals"], atol=0)
    assert float(
        jnp.abs(out_t["rgb_values"] - out0["rgb_values"]).max()
    ) < 0.15
    for k in ("rgb_values", "normal_map", "depth_values", "object_opacity",
              "sdf", "weights"):
        assert bool(jnp.all(jnp.isfinite(out_t[k]))), k

    # gradient flows into BOTH table regions under the tiered path
    rc = prefix_meta(cfg0.implicit.grid_meta, 5).table_rows

    def loss(p):
        o = render_rays(p, cfg_t, key, rays_o, rays_d, dscale, w2c,
                        training=True)
        return (o["rgb_values"] ** 2).mean() + (o["normal_map"] ** 2).mean()

    g = jax.grad(loss)(params)
    assert bool(jnp.all(jnp.isfinite(g["implicit"]["color_grid"])))
    assert float(jnp.abs(g["implicit"]["color_grid"][:rc]).max()) > 0.0


def test_tiered_config_validation():
    with pytest.raises(ValueError):
        _scene_cfg(render_fine_top_f=5, forward_grad_mode="vjp")
    with pytest.raises(ValueError):
        _scene_cfg(render_fine_top_f=10)  # must be < render_top_m
    with pytest.raises(ValueError):
        _scene_cfg(render_fine_top_f=1)


def test_train_step_runs_with_tiered_mode():
    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    cfg = dataclasses.replace(
        cfg, forward_grad_mode="fused", render_top_m=8, render_fine_top_f=4,
        render_fine_levels=max(1, cfg.implicit.num_levels - 2),
    )
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 100)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, LossConfig(), optimizer)

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
    key = jax.random.PRNGKey(1)
    for i in range(2):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, k, batch, i, call_reg=True, with_bg=False,
        )
    assert np.isfinite(float(metrics["loss"]))
