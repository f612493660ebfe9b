"""Phase attribution + mm-mode A/B for the v3 flat splat pipeline.

Measures, at the Stage-4 flagship bench shapes (100k surface gaussians,
512^2, TS=16):
  * full amortized grad step (the bench workload), per HOLOSCENE_FLAT_MM
    mode, plus forward-vs-f32 parity PSNR for the bf16 modes;
  * isolated phases: rebin, payload gather (planned_take fwd), gather VJP
    (blocked cumsum path), fwd kernel walk, full forward, full fwd+bwd.

Run on an idle chip: PYTHONPATH=/root/.axon_site:/root/repo
python scripts/probe_flat_v3.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

import bench  # noqa: E402
from holoscene_tpu.ops.gaussians import (  # noqa: E402
    covariance_3d,
    project_gaussians,
)
from holoscene_tpu.ops.splat import render_gaussians  # noqa: E402
from holoscene_tpu.ops import splat_flat as sf  # noqa: E402

N, RES, TS = 100_000, 512, 16
STEPS = 20


def _sync(out):
    # scalar readback forces the chain without hauling the array through
    # the relay (bench.py's convention)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *args, steps=STEPS):
    out = fn(*args)
    _sync(out)  # compile + settle
    t0 = time.perf_counter()
    for _i in range(steps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    rng = np.random.default_rng(0)
    n_floor = N * 6 // 10
    floor = np.stack([rng.uniform(-1, 1, n_floor), np.full(n_floor, 0.5),
                      rng.uniform(-1, 1, n_floor)], axis=-1)
    n_sph = N - n_floor
    u = rng.normal(size=(n_sph, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    centers = np.where((np.arange(n_sph) % 2 == 0)[:, None],
                       np.array([[-0.4, 0.2, 0.0]]),
                       np.array([[0.45, 0.3, 0.2]]))
    means = np.concatenate([floor, centers + u * 0.28]).astype(np.float32)
    spacing = float(np.sqrt(8.0 / N))
    params = {
        "means": jnp.asarray(means),
        "scales": jnp.asarray(np.log(
            rng.uniform(0.8, 1.6, (N, 3)) * spacing).astype(np.float32)),
        "opac": jnp.asarray(rng.normal(1.5, 0.5, N).astype(np.float32)),
        "colors": jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
    }
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array([[RES * 0.9, 0, RES / 2], [0, RES * 0.9, RES / 2],
                      [0, 0, 1.0]])
    tgt = jnp.asarray(rng.uniform(0, 1, (RES, RES, 3)).astype(np.float32))
    tiles = RES // TS

    def _proj(p):
        cov3d = covariance_3d(quats, jnp.exp(p["scales"]))
        return project_gaussians(p["means"], cov3d, viewmat, intr, RES, RES)

    xy0, depth0, conic0, _, valid0 = jax.jit(_proj)(params)
    opac0 = jax.nn.sigmoid(params["opac"])
    plan = sf.plan_flat(xy0, conic0, opac0, valid0, tiles, tiles, TS)
    print(f"plan: span {plan.span_x}x{plan.span_y} c_max {plan.c_max} "
          f"({plan.c_max // sf.CHUNK} chunks)", flush=True)

    rebin = jax.jit(lambda p: (lambda pr: sf.build_flat_bins(
        pr[0], pr[1], pr[2], jax.nn.sigmoid(p["opac"]), pr[4],
        tiles_x=tiles, tiles_y=tiles, tile_size=TS, plan=plan))(_proj(p)))
    bins = rebin(params)
    print(f"rebin: {timeit(rebin, params):.2f} ms", flush=True)

    def fwd(p, bins):
        return render_gaussians(
            p["means"], quats, jnp.exp(p["scales"]),
            jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
            width=RES, height=RES, tile_size=TS, flat_plan=plan,
            flat_bins=bins)["rgb"]

    def loss(p, bins):
        return jnp.mean((fwd(p, bins) - tgt) ** 2)

    fwd_j = jax.jit(fwd)
    step_j = jax.jit(jax.grad(loss))

    # isolated gather + gather-VJP (the planned_take path)
    pay16 = jnp.concatenate(
        [xy0, conic0, opac0[:, None], params["colors"], depth0[:, None],
         jnp.ones((N, 1)), jnp.zeros((N, 5))], axis=-1)
    pay16 = jnp.concatenate([pay16, jnp.zeros((1, 16))], axis=0)

    take_j = jax.jit(lambda p: sf._planned_take_sliced(
        p, bins["gidx"], bins["perm"], bins["bounds"], 11))
    print(f"gather fwd [c_max,16]: {timeit(take_j, pay16):.2f} ms",
          flush=True)
    take_g = jax.jit(jax.grad(lambda p: jnp.sum(sf._planned_take_sliced(
        p, bins["gidx"], bins["perm"], bins["bounds"], 11) ** 2)))
    print(f"gather fwd+VJP (blocked cumsum): {timeit(take_g, pay16):.2f} ms",
          flush=True)

    # isolated kernels on a fixed cand (field-major DMA layout)
    n_chunks = plan.c_max // sf.CHUNK
    cand = jnp.swapaxes(jnp.reshape(
        take_j(pay16), (n_chunks, sf.CHUNK, sf.CAND_ROWS)), 1, 2)
    n_tiles = tiles * tiles
    for mm in ("bf16x2", "bf16", "f32"):
        core = jax.jit(lambda c, mm=mm: sf._flat_core(
            c, bins["tile_chunk_start"], bins["tile_chunk_cnt"],
            n_tiles, TS, tiles, RES, RES, False, mm))
        print(f"fwd kernel walk [{mm}]: {timeit(core, cand):.2f} ms",
              flush=True)
        core_g = jax.jit(jax.grad(lambda c, mm=mm: jnp.sum(sf._flat_core(
            c, bins["tile_chunk_start"], bins["tile_chunk_cnt"],
            n_tiles, TS, tiles, RES, RES, False, mm)[:, :, :5] ** 2)))
        print(f"fwd+bwd kernel walk [{mm}]: {timeit(core_g, cand):.2f} ms",
              flush=True)

    # end-to-end per mm mode + parity
    ref_img = None
    for mm in ("f32", "bf16x2", "bf16"):
        os.environ["HOLOSCENE_FLAT_MM"] = mm
        fwd_m = jax.jit(lambda p, b, mm=mm: fwd(p, b))  # fresh cache key
        step_m = jax.jit(jax.grad(lambda p, b, mm=mm: loss(p, b)))
        t_f = timeit(fwd_m, params, bins)
        t_s = timeit(step_m, params, bins)
        img = np.asarray(fwd_m(params, bins))
        if mm == "f32":
            ref_img = img
            psnr = float("inf")
        else:
            mse = float(np.mean((img - ref_img) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"end-to-end [{mm}]: fwd {t_f:.2f} ms, grad-step {t_s:.2f} ms, "
              f"vs-f32 PSNR {psnr:.1f} dB", flush=True)
    os.environ.pop("HOLOSCENE_FLAT_MM", None)

    # bench-equivalent splats/s at the shipped cadence
    rebin_every = 8
    b = rebin(params)
    g = step_j(params, b)
    _ = float(g["means"][0, 0])
    t0 = time.perf_counter()
    for i in range(STEPS):
        if i % rebin_every == 0:
            b = rebin(params)
        g = step_j(params, b)
    _ = float(g["means"][0, 0])
    dt = time.perf_counter() - t0
    print(f"bench-equivalent: {N * STEPS / dt / 1e6:.2f} M splats/s "
          f"(rebin_every={rebin_every})", flush=True)


if __name__ == "__main__":
    main()
