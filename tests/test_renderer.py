import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss
from holoscene_tpu.models.fields import ImplicitNetworkConfig, RenderingNetworkConfig
from holoscene_tpu.models.holoscene import (
    HoloSceneConfig,
    init_holoscene,
    render_bg_patch,
    render_rays,
)
from holoscene_tpu.ops.sampler import SamplerConfig


def tiny_config(d_out=4):
    return HoloSceneConfig(
        implicit=ImplicitNetworkConfig(
            feature_vector_size=32, d_out=d_out, dims=(32, 32), multires=2,
            num_levels=4, level_dim=2, base_size=4, end_size=32, logmap=10,
        ),
        rendering=RenderingNetworkConfig(
            feature_vector_size=32, dims=(32, 32), multires_view=2,
            multires_point=2, multires_normal=2,
        ),
        sampler=SamplerConfig(
            N_samples=8, N_samples_eval=12, N_samples_extra=4,
            beta_iters=4, max_total_iters=2,
        ),
        use_bg_reg=True,
    )


def _ray_batch(n=8):
    o = jnp.stack(
        [jnp.linspace(-0.2, 0.2, n), jnp.zeros(n), jnp.full((n,), -1.5)], axis=-1
    )
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    scale = jnp.ones((n, 1))
    rot = jnp.eye(3)
    return o, d, scale, rot


def test_render_rays_outputs():
    cfg = tiny_config()
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    o, d, scale, rot = _ray_batch()
    out = render_rays(params, cfg, jax.random.PRNGKey(1), o, d, scale, rot,
                      training=True)
    n_final = cfg.sampler.n_final
    assert out["rgb_values"].shape == (8, 3)
    assert out["object_opacity"].shape == (8, 4)
    assert out["depth_values"].shape == (8, 1)
    assert out["normal_map"].shape == (8, 3)
    assert out["sdf"].shape == (8, n_final)
    assert out["grad_theta"].shape[1:] == (5, 3)
    assert out["sample_sdf"].shape[1] == 4
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v))), "non-finite render output"
    # rgb in [0, 1] (sigmoid composited by weights summing <= 1)
    assert float(out["rgb_values"].min()) >= 0.0
    assert float(out["rgb_values"].max()) <= 1.0 + 1e-5


def test_render_bg_patch_outputs():
    cfg = tiny_config()
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    n = 16
    o, d, scale, rot = _ray_batch(n)
    out = render_bg_patch(params, cfg, jax.random.PRNGKey(1), o, d, scale, rot)
    assert out["bg_depth_values"].shape == (n, 1)
    assert out["bg_normal_map"].shape == (n, 3)
    assert out["bg_mask"].shape == (n, 1)


def test_loss_and_gradients_end_to_end():
    cfg = tiny_config()
    lcfg = LossConfig(depth_weight=0.5, semantic_weight=1.0)
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    o, d, scale, rot = _ray_batch()
    gt = {
        "rgb": jnp.ones((8, 3)) * 0.5,
        "depth": jnp.ones((8, 1)) * 1.3,
        "normal": jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1)),
        "segs": jnp.zeros((8,), dtype=jnp.int32),
        "mask": jnp.ones((8, 1)),
    }

    def loss_fn(p, key):
        out = render_rays(p, cfg, key, o, d, scale, rot, training=True)
        losses = holoscene_loss(out, gt, lcfg, step=0, call_reg=True)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(loss))
    for name in ["rgb_loss", "eikonal_loss", "smooth_loss", "depth_loss",
                 "normal_l1", "normal_cos", "semantic_loss", "collision_reg_loss"]:
        assert bool(jnp.isfinite(losses[name])), name

    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert bool(jnp.all(jnp.isfinite(flat)))
    # beta must receive gradient (density is learnable)
    assert float(jnp.abs(grads["density"]["beta"])) > 0


def test_overfit_single_batch_decreases_loss():
    """Tiny optimization sanity check: loss must drop when overfitting a
    fixed ray batch for a few steps."""
    import optax

    cfg = tiny_config()
    lcfg = LossConfig(depth_weight=0.1, semantic_weight=0.5)
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    o, d, scale, rot = _ray_batch()
    gt = {
        "rgb": jnp.ones((8, 3)) * jnp.array([0.8, 0.2, 0.3]),
        "depth": jnp.ones((8, 1)) * 1.2,
        "normal": jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1)),
        "segs": jnp.zeros((8,), dtype=jnp.int32),
        "mask": jnp.ones((8, 1)),
    }
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(pp):
            out = render_rays(pp, cfg, key, o, d, scale, rot, training=True)
            return holoscene_loss(out, gt, lcfg, step=0)["loss"]

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(12):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_render_top_m_pruning_close_to_full():
    """Top-M pruning keeps the render close to the full-sample render: the
    dropped samples are exactly the ones the sampler resolved as ~zero
    weight, and the kept set still spans [near, far]."""
    import dataclasses

    cfg = tiny_config()
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    o, d, scale, rot = _ray_batch()
    key = jax.random.PRNGKey(7)

    full = render_rays(params, cfg, key, o, d, scale, rot, training=True)
    n_final = cfg.sampler.n_final
    cfg_p = dataclasses.replace(cfg, render_top_m=n_final - 4)
    pruned = render_rays(params, cfg_p, key, o, d, scale, rot, training=True)

    assert pruned["sdf"].shape == (8, n_final - 4)
    np.testing.assert_allclose(
        np.asarray(pruned["rgb_values"]), np.asarray(full["rgb_values"]),
        atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(pruned["depth_values"]), np.asarray(full["depth_values"]),
        atol=0.08,
    )
    # kept z set spans the full ray: endpoints force-kept
    np.testing.assert_allclose(
        np.asarray(pruned["z_vals"][:, 0]), np.asarray(full["z_vals"][:, 0]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pruned["z_vals"][:, -1]), np.asarray(full["z_vals"][:, -1]),
        atol=1e-6,
    )

    # eval path ignores pruning entirely (exact renders for metrics)
    ev_full = render_rays(params, cfg, key, o, d, scale, rot, training=False)
    ev_pruned = render_rays(params, cfg_p, key, o, d, scale, rot,
                            training=False)
    np.testing.assert_allclose(
        np.asarray(ev_pruned["rgb_values"]), np.asarray(ev_full["rgb_values"]),
        atol=1e-6,
    )

    # gradients stay finite through the pruned path
    def loss_fn(p):
        out = render_rays(p, cfg_p, key, o, d, scale, rot, training=True)
        return (out["rgb_values"] ** 2).sum() + (out["grad_theta"] ** 2).sum()

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))
