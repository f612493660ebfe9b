"""Occupancy-grid sampling restriction (ops/occupancy.py + the stage-1
wiring): update/decay semantics, range tightening with conservative
fallbacks, and no-op equivalence when the grid claims everything occupied."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.occupancy import (
    OccGridConfig,
    init_occ_grid,
    occupied_mask,
    ray_range,
    update_occ_grid,
)

CFG = OccGridConfig(resolution=16, bound=1.0, taps=32)


def test_init_is_fully_occupied():
    occ = init_occ_grid(CFG)
    assert occ.shape == (16 ** 3,)
    assert bool(jnp.all(occupied_mask(occ, 0.01, CFG)))


def test_update_refreshes_probed_and_decays_unprobed():
    occ = jnp.full((16 ** 3,), 0.5, jnp.float32)
    pts = jnp.array([[0.03, 0.03, 0.03], [0.05, 0.05, 0.05]])
    sdf = jnp.array([0.2, -0.1])  # same cell; min |sdf| = 0.1
    new = update_occ_grid(occ, pts, sdf, CFG)
    # probed cell = batch min |sdf|
    g = CFG.resolution
    idx = (8 * g + 8) * g + 8  # cell of (0.03, 0.03, 0.03)
    np.testing.assert_allclose(float(new[idx]), 0.1, rtol=1e-6)
    # every other cell decayed toward occupied
    mask = np.ones(g ** 3, bool)
    mask[idx] = False
    np.testing.assert_allclose(np.asarray(new)[mask], 0.5 * CFG.decay,
                               rtol=1e-6)


def test_update_ignores_points_outside_grid():
    occ = jnp.full((16 ** 3,), 0.4, jnp.float32)
    pts = jnp.array([[5.0, 5.0, 5.0]])  # far outside [-1, 1]^3
    new = update_occ_grid(occ, pts, jnp.array([0.01]), CFG)
    np.testing.assert_allclose(np.asarray(new), 0.4 * CFG.decay, rtol=1e-6)


def test_ray_range_tightens_to_occupied_slab():
    """Grid empty except a slab around z in [0.4, 0.6]: a +z ray's interval
    must shrink to roughly the slab (with tap padding)."""
    g = CFG.resolution
    occ = jnp.full((g ** 3,), 1.0, jnp.float32)  # min|sdf| huge = empty
    # mark cells along the +z column near z ~ 0.5 as surface
    zs = np.linspace(0.42, 0.58, 5)
    cells = []
    for z in zs:
        ix = int((0.0 + 1.0) * g / 2.0)
        iz = int((z + 1.0) * g / 2.0)
        cells.append((ix * g + ix) * g + iz)
    occ = occ.at[jnp.asarray(cells)].set(0.0)

    rays_o = jnp.array([[0.01, 0.01, -0.9]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    near = jnp.array([[0.0]])
    far = jnp.array([[2.5]])
    n_r, f_r = ray_range(occ, rays_o, rays_d, near, far, 0.005, CFG)
    # occupied span in ray-t: z=0.42 -> t ~ 1.32, z=0.58 -> t ~ 1.48
    assert 1.0 < float(n_r[0, 0]) < 1.35
    assert 1.45 < float(f_r[0, 0]) < 1.85
    # a ray through empty space keeps the full interval
    rays_o2 = jnp.array([[0.9, 0.9, -0.9]])
    n2, f2 = ray_range(occ, rays_o2, rays_d, near, far, 0.005, CFG)
    assert float(n2[0, 0]) == 0.0 and float(f2[0, 0]) == 2.5


def test_ray_range_beta_margin_keeps_soft_cells():
    """Early training (large beta) must treat moderately-distant cells as
    occupied: with beta = 0.2 the 4*beta margin covers est = 0.5."""
    g = CFG.resolution
    occ = jnp.full((g ** 3,), 0.5, jnp.float32)
    rays_o = jnp.array([[0.0, 0.0, -0.9]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = jnp.array([[0.0]]), jnp.array([[2.5]])
    n_hi, f_hi = ray_range(occ, rays_o, rays_d, near, far, 0.2, CFG)
    # everything IN-GRID occupied at this beta -> near stays, far tightens
    # only to the grid exit (t = 1.9 where the ray leaves [-1,1]^3) + pad:
    # space beyond the scene box is empty for the foreground field
    assert float(n_hi[0, 0]) == 0.0
    assert 1.85 < float(f_hi[0, 0]) < 2.2
    # converged beta -> 0.5 > margin -> nothing occupied -> fallback = full
    n_lo, f_lo = ray_range(occ, rays_o, rays_d, near, far, 0.001, CFG)
    assert float(n_lo[0, 0]) == 0.0 and float(f_lo[0, 0]) == 2.5


def test_train_step_with_all_occupied_grid_matches_baseline():
    """occ = init grid (occupied everywhere) must be a numerical no-op:
    identical loss/psnr to the occ-less step on the same batch, and the
    4-tuple return carries the refreshed grid."""
    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    occ_cfg = OccGridConfig(resolution=8, taps=16,
                            bound=cfg.scene_bounding_sphere)
    cfg = dataclasses.replace(cfg, use_occupancy=True, occupancy=occ_cfg)

    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 1000)
    step = make_train_step(cfg, LossConfig(), optimizer)

    n_rays = 32
    rng = np.random.default_rng(2)
    batch = {
        "uv": jnp.asarray(rng.uniform(0, 32, (n_rays, 2)), jnp.float32),
        "pose": jnp.eye(4),
        "intrinsics": jnp.asarray(
            [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], jnp.float32),
        "rgb": jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32),
        "depth": jnp.ones((n_rays, 1)),
        "normal": jnp.tile(jnp.asarray([[0.0, 0, -1]]), (n_rays, 1)),
        "segs": jnp.zeros((n_rays,), jnp.int32),
        "mask": jnp.ones((n_rays, 1)),
    }
    key = jax.random.PRNGKey(5)

    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = optimizer.init(params)
    _, _, m1 = step(p1, o1, key, batch, 0, call_reg=True, with_bg=False)

    occ = init_occ_grid(occ_cfg)
    p2 = jax.tree_util.tree_map(jnp.array, params)
    o2 = optimizer.init(params)
    p2_out, o2_out, m2, occ2 = step(
        p2, o2, key, batch, 0, call_reg=True, with_bg=False,
        occ=occ, update_occ=True,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["psnr"]), float(m2["psnr"]),
                               rtol=1e-6)
    # the update touched the grid: probed cells now hold real |sdf| evidence
    assert occ2.shape == occ.shape
    assert float(jnp.max(occ2)) > 0.0
    # a second step consuming the refreshed grid still trains finite
    _, _, m3, occ3 = step(
        p2_out, o2_out, jax.random.PRNGKey(6), batch, 1,
        call_reg=True, with_bg=False, occ=occ2, update_occ=False,
    )
    assert np.isfinite(float(m3["loss"]))
    np.testing.assert_array_equal(np.asarray(occ3), np.asarray(occ2))
