"""Round-4 Stage-4 probe: saturation-trimmed plans + lane-major backward
cumsum vs the round-3 flat baseline, at the exact bench scene/shapes.

Measures (readback-forced, idle chip, chip lock held):
  1. the tile saturation profile (used vs binned chunks) — how much the
     per-step gathers over-fetch behind the saturation depth;
  2. end-to-end grad-step time for: baseline / cumsum=lanes / trimmed /
     trimmed+lanes, each with the bench's rebin_every=8 amortization;
  3. exactness of the trimmed render vs the full plan (must be bitwise on
     a static scene) and the stale flag staying 0.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

import jax
import jax.numpy as jnp

import bench
from holoscene_tpu.ops.gaussians import covariance_3d, project_gaussians
from holoscene_tpu.ops.splat import render_gaussians
from holoscene_tpu.ops.splat_flat import (
    build_flat_bins,
    plan_flat,
    plan_trimmed,
)
from holoscene_tpu.utils.chiplock import chip_lock

N = int(os.environ.get("PROBE_N", "100000"))
RES = int(os.environ.get("PROBE_RES", "512"))
STEPS = int(os.environ.get("PROBE_STEPS", "24"))
REBIN = int(os.environ.get("PROBE_REBIN", "8"))
SLACK = int(os.environ.get("PROBE_SLACK", "2"))


def run():
    params, quats, viewmat, intr, tgt = bench.make_splat_scene(N, RES)
    tiles = RES // 16

    def _proj(p):
        cov3d = covariance_3d(quats, jnp.exp(p["scales"]))
        return project_gaussians(p["means"], cov3d, viewmat, intr, RES, RES)

    xy0, _, conic0, _, valid0 = jax.jit(_proj)(params)
    opac0 = jax.nn.sigmoid(params["opac"])
    plan = plan_flat(xy0, conic0, opac0, valid0, tiles, tiles, 16)

    def make_rebin(pl, used=None):
        @jax.jit
        def rebin(p):
            xy, depth, conic, _, valid = _proj(p)
            return build_flat_bins(
                xy, depth, conic, jax.nn.sigmoid(p["opac"]), valid,
                tiles_x=tiles, tiles_y=tiles, tile_size=16, plan=pl,
                used_chunks=used, trim_slack=SLACK)
        return rebin

    def make_step(pl, lanes: bool, power: str = "vpu"):
        def loss(p, bins):
            os.environ["HOLOSCENE_FLAT_CUMSUM"] = (
                "lanes" if lanes else "blocked")
            os.environ["HOLOSCENE_FLAT_POWER"] = power
            out = render_gaussians(
                p["means"], quats, jnp.exp(p["scales"]),
                jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
                width=RES, height=RES, tile_size=16, flat_plan=pl,
                flat_bins=bins)
            return jnp.mean((out["rgb"] - tgt) ** 2)
        return jax.jit(jax.grad(loss))

    def make_render(pl):
        @jax.jit
        def render(p, bins):
            return render_gaussians(
                p["means"], quats, jnp.exp(p["scales"]),
                jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
                width=RES, height=RES, tile_size=16, flat_plan=pl,
                flat_bins=bins)
        return render

    # --- saturation profile ------------------------------------------------
    rebin_full = make_rebin(plan)
    bins_full = rebin_full(params)
    render_full = make_render(plan)
    out_full = render_full(params, bins_full)
    used = np.asarray(out_full["used_chunks"])
    cnt = np.asarray(bins_full["tile_chunk_cnt"])
    print(f"plan: c_max {plan.c_max} ({plan.c_max // 128} chunks), "
          f"span {plan.span_x}x{plan.span_y}")
    print(f"binned chunks {cnt.sum()}, walked {used.sum()} "
          f"({100 * used.sum() / max(cnt.sum(), 1):.0f}%); "
          f"per-tile cnt p50/p90/max {np.percentile(cnt, 50):.0f}/"
          f"{np.percentile(cnt, 90):.0f}/{cnt.max()}, "
          f"used p50/p90/max {np.percentile(used, 50):.0f}/"
          f"{np.percentile(used, 90):.0f}/{used.max()}")

    tplan = plan_trimmed(plan, cnt, used, trim_slack=SLACK)
    print(f"trimmed plan: c_max {tplan.c_max} "
          f"({100 * tplan.c_max / plan.c_max:.0f}% of full)")

    used_j = jnp.asarray(used)
    rebin_trim = make_rebin(tplan, used_j)
    bins_trim = rebin_trim(params)
    render_trim = make_render(tplan)
    out_trim = render_trim(params, bins_trim)
    err = float(jnp.max(jnp.abs(out_trim["rgb"] - out_full["rgb"])))
    print(f"trim exactness: max|rgb diff| {err:.2e}, "
          f"stale={int(out_trim['stale'])}, "
          f"overflow={int(bins_trim['overflow'])}")

    # --- timings -------------------------------------------------------------
    def timeit_step(step, rebin, bins0, tag):
        g = step(params, bins0)
        _ = float(g["means"][0, 0])
        bins = bins0
        t0 = time.perf_counter()
        for i in range(STEPS):
            if i % REBIN == 0:
                bins = rebin(params)
            g = step(params, bins)
        _ = float(g["means"][0, 0])
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{tag}: {dt * 1e3:7.2f} ms/step "
              f"({N / dt / 1e6:6.2f} M splats/s @ rebin_every={REBIN})",
              flush=True)
        return dt

    def timeit_fwd(render, rebin, tag):
        bins = rebin(params)
        o = render(params, bins)
        _ = float(o["rgb"][0, 0, 0])
        t0 = time.perf_counter()
        for _i in range(STEPS):
            o = render(params, bins)
        _ = float(o["rgb"][0, 0, 0])
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{tag}: {dt * 1e3:7.2f} ms fwd", flush=True)
        return dt

    timeit_fwd(render_full, rebin_full, "fwd full       ")
    timeit_fwd(render_trim, rebin_trim, "fwd trimmed    ")

    base = timeit_step(make_step(plan, False), rebin_full, bins_full,
                       "grad full/blocked ")
    timeit_step(make_step(plan, True), rebin_full, bins_full,
                "grad full/lanes   ")
    timeit_step(make_step(tplan, False), rebin_trim, bins_trim,
                "grad trim/blocked ")
    tl = timeit_step(make_step(tplan, True), rebin_trim, bins_trim,
                     "grad trim/lanes   ")
    # MXU-power kernels (exponent via [P,6]@[6,C], gradient rows via pixel
    # moments) on the trimmed plan
    tm = timeit_step(make_step(tplan, False, power="mxu"), rebin_trim,
                     bins_trim, "grad trim/mxupow  ")
    # parity check vs the vpu-power step on identical inputs
    g_v = make_step(tplan, False, power="vpu")(params, bins_trim)
    g_m = make_step(tplan, False, power="mxu")(params, bins_trim)
    md = max(float(jnp.max(jnp.abs(g_v[k] - g_m[k])))
             for k in g_v)
    print(f"mxu-power grad parity: max|diff| {md:.2e}")
    print(f"combined speedup: {base / min(tl, tm):.2f}x")


if __name__ == "__main__":
    with chip_lock("probe_flat_r4"):
        run()
