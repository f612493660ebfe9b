import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.models.gaussians_free import (
    FreeGaussianConfig,
    accumulate_positional_grads,
    init_free_gaussians,
    init_selective_adam,
    mcmc_relocate,
    refine_gaussians,
    render_free_gaussians,
    reset_moments,
    selective_adam_update,
)
from holoscene_tpu.training.gs_trainer import GSTrainer

CFG = FreeGaussianConfig(capacity=256, sh_degree=1, max_per_tile=64)


def _model(n_seed=64):
    pts = np.random.default_rng(0).uniform(-0.5, 0.5, (n_seed, 3))
    return init_free_gaussians(jax.random.PRNGKey(0), CFG, pts)


def test_init_capacity_and_alive():
    params, state = _model(64)
    assert params["means"].shape == (256, 3)
    assert int(state["alive"].sum()) == 64
    assert bool(jnp.all(jnp.isfinite(params["log_scales"][:64])))


def test_render_only_alive():
    params, state = _model(64)
    pose = jnp.eye(4).at[2, 3].set(-2.0)
    intr = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    out = render_free_gaussians(params, state, CFG, pose, intr, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    # killing all gaussians produces an empty image
    state_dead = {**state, "alive": jnp.zeros(256, bool)}
    out2 = render_free_gaussians(params, state_dead, CFG, pose, intr, 32, 32)
    assert float(out2["alpha"].max()) < 1e-6


def test_selective_adam_masks_updates():
    params, state = _model(8)
    moments = init_selective_adam(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    vis = jnp.zeros(256, bool).at[:4].set(True)
    new_p, new_m = selective_adam_update(grads, moments, params, vis, 0.01)
    # visible slots moved, invisible untouched
    assert float(jnp.abs(new_p["means"][:4] - params["means"][:4]).sum()) > 0
    np.testing.assert_allclose(
        np.asarray(new_p["means"][4:]), np.asarray(params["means"][4:])
    )
    # moment reset surgery
    m2 = reset_moments(new_m, jnp.ones(256, bool))
    assert float(jnp.abs(m2["m"]["means"]).sum()) == 0.0


def test_refine_culls_and_spawns():
    params, state = _model(64)
    # mark half as transparent -> cull; give the rest hot gradients
    params = dict(params)
    params["opacity_logits"] = params["opacity_logits"].at[:32].set(-10.0)
    state = dict(state)
    state["grad_accum"] = jnp.zeros(256).at[32:64].set(1.0)
    state["grad_count"] = jnp.zeros(256).at[32:64].set(1.0)
    new_p, new_s, stats = refine_gaussians(
        jax.random.PRNGKey(1), params, state, CFG, scene_extent=1.0
    )
    assert int(stats["n_culled"]) == 32
    assert int(stats["n_spawned"]) > 0
    assert int(new_s["n_alive"]) if "n_alive" in new_s else True
    assert int(new_s["alive"].sum()) == 64 - 32 + int(stats["n_spawned"])
    # grad accumulators reset
    assert float(new_s["grad_accum"].sum()) == 0.0


def test_mcmc_relocate_preserves_alive_count():
    params, state = _model(64)
    n_before = int(state["alive"].sum())
    new_p, new_s, stats = mcmc_relocate(
        jax.random.PRNGKey(2), params, state, CFG, fraction=0.05
    )
    assert int(new_s["alive"].sum()) == n_before
    assert bool(jnp.all(jnp.isfinite(new_p["opacity_logits"])))


def test_gs_trainer_end_to_end(tmp_path):
    root = tmp_path / "data"
    generate_scene(str(root / "scene_0"), n_images=5, img_res=(32, 32))
    ds = NSDataset(str(root), "scene_0", img_res=(32, 32))
    trainer = GSTrainer(
        ds,
        cfg=FreeGaussianConfig(capacity=512, sh_degree=1, max_per_tile=64,
                               cull_alpha_thresh=0.05),
        warmup=60, refine_every=40, quiet=True, scene_extent=1.0,
    )
    before = trainer.eval_split("train", max_frames=2)["psnr"]
    hist = trainer.run(n_iters=150, log_every=10)
    assert all(np.isfinite(h["loss"]) for h in hist)
    after = trainer.eval_split("train", max_frames=2)["psnr"]
    assert after > before, f"psnr {before:.2f} -> {after:.2f}"
    p = trainer.export(str(tmp_path / "gs.ply"))
    from holoscene_tpu.models.gom import read_gaussian_ply

    g = read_gaussian_ply(p)
    assert len(g["means"]) == hist[-1]["n_alive"]
