"""Where do the flat forward's ~9.5 ms go? (r4 follow-up: walk alone is
~3.9 ms, gather ~1.7 trimmed — attribute the rest: payload pack+transpose,
the [T,P,8] out-buffer layout, the tiles_to_image epilogue, loss grad.)
Scan-amortized timings with the PERF.md sync rules (returned value is the
consumer, readback sync)."""
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
from holoscene_tpu.ops.splat_flat import (
    CAND_ROWS,
    CHUNK,
    _flat_core,
    _mm_mode,
    _planned_take_sliced,
    build_flat_bins,
    plan_flat,
    plan_trimmed,
)
from holoscene_tpu.utils.chiplock import chip_lock

N = int(os.environ.get("PROBE_N", "100000"))
RES = int(os.environ.get("PROBE_RES", "512"))
K = int(os.environ.get("PROBE_REPS", "12"))


def timeit(fn, *args, tag=""):
    # sync by a jitted scalar reduce: reading any full output copies MBs
    # through the relay (~300 MB/s) and swamps the op being measured (the
    # first run of this probe measured exactly that)
    red = jax.jit(lambda *a: sum(
        jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(fn(*a))
        if jnp.issubdtype(leaf.dtype, jnp.floating)))
    _ = float(red(*args))
    t0 = time.perf_counter()
    for _i in range(K):
        out = red(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{tag}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def run():
    params, quats, viewmat, intr, tgt = bench.make_splat_scene(N, RES)
    tiles = RES // 16
    n_tiles = tiles * tiles

    def _proj(p):
        cov3d = covariance_3d(quats, jnp.exp(p["scales"]))
        return project_gaussians(p["means"], cov3d, viewmat, intr, RES, RES)

    xy, depth, conic, _r, valid = jax.jit(_proj)(params)
    opac = jax.nn.sigmoid(params["opac"])
    rgbs = params["colors"]
    plan0 = plan_flat(xy, conic, opac, valid, tiles, tiles, 16)
    bins0 = build_flat_bins(xy, depth, conic, opac, valid, tiles_x=tiles,
                            tiles_y=tiles, tile_size=16, plan=plan0)

    from holoscene_tpu.ops.splat import render_gaussians

    out0 = jax.jit(lambda: render_gaussians(
        params["means"], quats, jnp.exp(params["scales"]), opac, rgbs,
        viewmat, intr, width=RES, height=RES, tile_size=16,
        flat_plan=plan0, flat_bins=bins0))()
    plan = plan_trimmed(plan0, bins0["tile_chunk_cnt"], out0["used_chunks"],
                        trim_slack=2)
    bins = build_flat_bins(xy, depth, conic, opac, valid, tiles_x=tiles,
                           tiles_y=tiles, tile_size=16, plan=plan,
                           used_chunks=out0["used_chunks"], trim_slack=2)
    n = xy.shape[0]
    n_chunks = plan.c_max // CHUNK
    print(f"trimmed plan: {plan.c_max} slots ({n_chunks} chunks)")

    # payload build (concat) — [N+1, 16]
    @jax.jit
    def payload_of(xy, conic, opac, rgbs, depth):
        pay = jnp.concatenate(
            [xy, conic, opac[:, None], rgbs, depth[:, None],
             jnp.ones((n, 1), xy.dtype),
             jnp.zeros((n, CAND_ROWS - 11), xy.dtype)], axis=-1)
        return jnp.concatenate(
            [pay, jnp.zeros((1, CAND_ROWS), pay.dtype)], axis=0)

    payload = payload_of(xy, conic, opac, rgbs, depth)
    timeit(payload_of, xy, conic, opac, rgbs, depth, tag="payload concat    ")

    gather = jax.jit(lambda pay: _planned_take_sliced(
        pay, bins["gidx"], bins["perm"], bins["bounds"], 11))
    rows = gather(payload)
    timeit(gather, payload, tag="gather [c,16]     ")

    g_t = jax.jit(lambda pay: jnp.swapaxes(
        gather(pay).reshape(n_chunks, CHUNK, CAND_ROWS), 1, 2))
    cand = g_t(payload)
    timeit(g_t, payload, tag="gather+transpose  ")

    interp = jax.default_backend() != "tpu"
    core = jax.jit(lambda c: _flat_core(
        c, bins["tile_chunk_start"], bins["tile_chunk_cnt"], n_tiles, 16,
        tiles, RES, RES, interp, _mm_mode()))
    timeit(core, cand, tag="walk kernel       ")

    timeit(jax.jit(lambda pay: core(g_t(pay))), payload,
           tag="gather+walk       ")

    # epilogue: out [T,P,8] -> image channels
    out_t = core(cand)

    @jax.jit
    def epilogue(o):
        rgb_t = o[:, :, :3]
        alpha = o[:, :, 4]
        d = o[:, :, 3] / jnp.maximum(alpha, 1e-10)
        img = rgb_t.reshape(tiles, tiles, 16, 16, 3).swapaxes(1, 2)
        return img.reshape(RES, RES, 3), d, alpha

    timeit(epilogue, out_t, tag="epilogue          ")

    # full renderer fwd (everything incl. projection + sh + epilogue)
    render = jax.jit(lambda p: render_gaussians(
        p["means"], quats, jnp.exp(p["scales"]), jax.nn.sigmoid(p["opac"]),
        p["colors"], viewmat, intr, width=RES, height=RES, tile_size=16,
        flat_plan=plan, flat_bins=bins)["rgb"])
    timeit(render, params, tag="full fwd          ")

    # loss-grad pieces
    loss = jax.jit(jax.grad(lambda p: jnp.mean((render_gaussians(
        p["means"], quats, jnp.exp(p["scales"]), jax.nn.sigmoid(p["opac"]),
        p["colors"], viewmat, intr, width=RES, height=RES, tile_size=16,
        flat_plan=plan, flat_bins=bins)["rgb"] - tgt) ** 2)))
    timeit(loss, params, tag="full fwd+bwd      ")

    # backward-side attribution (round 5: bwd is ~10.6 of the 19.9 ms step
    # and was never split)
    core_g = jax.jit(jax.grad(lambda c: jnp.sum(core(c))))
    timeit(core_g, cand, tag="walk fwd+bwd      ")
    gw_g = jax.jit(jax.grad(lambda pay: jnp.sum(core(g_t(pay)))))
    timeit(gw_g, payload, tag="gthr+walk fwd+bwd ")
    proj_g = jax.jit(jax.grad(lambda p: sum(
        jnp.sum(x) for x in _proj(p)[:3])))
    timeit(proj_g, params, tag="projection f+b    ")

    # channels-major full step (the r5 CHW pipeline; bench parity check)
    tgt_chw = tgt.transpose(2, 0, 1)
    loss_chw = jax.jit(jax.grad(lambda p: jnp.mean((render_gaussians(
        p["means"], quats, jnp.exp(p["scales"]), jax.nn.sigmoid(p["opac"]),
        p["colors"], viewmat, intr, width=RES, height=RES, tile_size=16,
        flat_plan=plan, flat_bins=bins, chw=True)["rgb"] - tgt_chw) ** 2)))
    timeit(loss_chw, params, tag="full f+b CHW      ")


if __name__ == "__main__":
    with chip_lock("probe_flat_fwd_parts"):
        run()
