"""Stage-1 occupancy attribution (round 4): how much of the step does the
occupancy-restricted sampling interval actually save, and where.

Measures at bench shapes (1024 rays, flagship config), scan-amortized with
readback sync (PERF.md pitfalls):
  1. sampler alone, full interval vs occupancy-restricted;
  2. the full train step, occ off / on (update off) / on (update step);
  3. the occupancy update cost alone (scatter-min fold).
The grid is warmed by a few real update steps first, so the restriction
reflects the geometric-init SDF (a sphere shell — cells far from the
shell genuinely empty)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import holoscene_tpu  # noqa: E402

holoscene_tpu.setup_compile_cache()

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from bench import flagship_config, make_batch  # noqa: E402
from holoscene_tpu.losses.holoscene_loss import LossConfig  # noqa: E402
from holoscene_tpu.models.holoscene import (  # noqa: E402
    get_beta,
    init_holoscene,
    scene_sdf_nograd,
)
from holoscene_tpu.ops.occupancy import (  # noqa: E402
    init_occ_grid,
    occupied_mask,
    ray_range,
    update_occ_grid,
)
from holoscene_tpu.ops.rays import near_far_from_cube  # noqa: E402
from holoscene_tpu.ops.sampler import error_bound_sample  # noqa: E402
from holoscene_tpu.training.stage1 import (  # noqa: E402
    make_optimizer,
    make_train_step,
    rays_from_batch,
)
from holoscene_tpu.utils.chiplock import chip_lock  # noqa: E402

NRAYS = 1024
K = 9


def timeit(fn, *args, tag="", reps=4):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts) * 1e3:7.1f} ms", flush=True)
    return min(ts)


def run():
    cfg = dataclasses.replace(flagship_config(), use_occupancy=True)
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0,
                      reg_vio_weight=0.01)
    optimizer = make_optimizer(5e-4, 20.0, 200000)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, lcfg, optimizer)
    batch = make_batch(jax.random.PRNGKey(3), NRAYS)
    key = jax.random.PRNGKey(0)

    # warm the grid with real update steps, then pin beta to the ANNEALED
    # regime (~0.01 by iteration ~2k of a 100k-iter run) — at the init
    # beta=0.1 the 4-beta safety margin marks every cell occupied and the
    # restriction is correctly a no-op (bench_occ r4 measured exactly
    # that: 5035 vs 5061 rays/s); occupancy is a LATE-TRAINING lever and
    # this probe measures that regime
    occ = init_occ_grid(cfg.occupancy)
    p, o = params, opt_state
    for i in range(3):
        key, k = jax.random.split(key)
        p, o, m, occ = step(p, o, k, batch, i, call_reg=True, with_bg=False,
                            occ=occ, update_occ=True)
    _ = float(m["loss"])
    p["density"]["beta"] = jnp.asarray(0.01, jnp.float32)
    for i in range(3, 6):
        key, k = jax.random.split(key)
        p, o, m, occ = step(p, o, k, batch, i, call_reg=True, with_bg=False,
                            occ=occ, update_occ=True)
    _ = float(m["loss"])
    beta = float(get_beta(p, cfg))
    occ_np = np.asarray(occupied_mask(occ, beta, cfg.occupancy))
    print(f"grid after 6 updates: {100 * occ_np.mean():.0f}% cells "
          f"occupied at beta={beta:.4f}", flush=True)

    rays_o, rays_d, _, _ = rays_from_batch(
        batch["uv"], batch["pose"], batch["intrinsics"],
        jax.random.PRNGKey(1))
    _, far0 = near_far_from_cube(
        rays_o, rays_d, bound=cfg.sampler.scene_bounding_sphere,
        min_near=cfg.sampler.near, max_far=cfg.sampler.far)
    near0 = jnp.zeros((NRAYS, 1))
    nr, fr = jax.jit(lambda occ: ray_range(
        occ, rays_o, rays_d, near0, far0,
        jax.lax.stop_gradient(get_beta(p, cfg)), cfg.occupancy))(occ)
    shrink = float(jnp.mean((fr - nr) / jnp.maximum(far0 - near0, 1e-9)))
    print(f"mean interval shrink: {100 * shrink:.0f}% of full", flush=True)

    sdf_fn = scene_sdf_nograd(p, cfg)
    beta_j = jax.lax.stop_gradient(get_beta(p, cfg))

    @jax.jit
    def samp_full(ro, rd):
        z, _ = error_bound_sample(jax.random.PRNGKey(1), ro, rd, sdf_fn,
                                  beta_j, cfg.sampler, training=True)
        return z

    @jax.jit
    def samp_occ(ro, rd):
        n_, f_ = ray_range(occ, ro, rd, near0, far0, beta_j, cfg.occupancy)
        z, _ = error_bound_sample(jax.random.PRNGKey(1), ro, rd, sdf_fn,
                                  beta_j, cfg.sampler, training=True,
                                  near=n_, far=f_)
        return z

    timeit(samp_full, rays_o, rays_d, tag="sampler full     ")
    timeit(samp_occ, rays_o, rays_d, tag="sampler occ      ")

    # full steps: fresh param copies each variant (donation)
    def run_variant(tag, use_occ, update):
        pp = jax.tree_util.tree_map(jnp.array, p)
        oo = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if hasattr(x, "shape") else x, o)
        kk = jax.random.PRNGKey(9)
        state = {"p": pp, "o": oo}

        def body():
            nonlocal kk
            kk, k2 = jax.random.split(kk)
            if use_occ:
                state["p"], state["o"], m, _occ2 = step(
                    state["p"], state["o"], k2, batch, 100, call_reg=True,
                    with_bg=False, occ=occ, update_occ=update)
            else:
                state["p"], state["o"], m = step(
                    state["p"], state["o"], k2, batch, 100, call_reg=True,
                    with_bg=False)
            return m["loss"]

        _ = float(body())  # compile
        t0 = time.perf_counter()
        for _i in range(10):
            out = body()
        _ = float(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{tag}: {dt * 1e3:7.1f} ms/step ({NRAYS / dt:6.0f} rays/s)",
              flush=True)

    run_variant("step occ=off          ", False, False)
    run_variant("step occ=on           ", True, False)
    run_variant("step occ=on + update  ", True, True)


if __name__ == "__main__":
    with chip_lock("probe_occ_phases"):
        run()
