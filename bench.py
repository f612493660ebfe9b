"""Benchmark: Stage-1 training-step throughput (rays/sec) on one TPU chip.

Runs the full jitted Stage-1 training step — jittered ray generation,
error-bounded VolSDF sampling (5 upsample rounds), hash-grid SDF forward with
scene-SDF gradients, IDR color MLP, volume rendering + occlusion opacities,
the complete loss stack, and the Adam update — at the reference's headline
Replica workload shapes (BASELINE.md: 1024 rays/iter, d_out=32, 16-level
2^19 hash tables x2, sampler 64/128/32 with 5 upsample iterations).

Prints ONE JSON line:
  {"metric": "stage1_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / (2 x estimated A100 reference rays/s)}

The reference publishes no throughput numbers (BASELINE.md); the baseline
constant below is an estimate of the reference's A100 Stage-1 rate
(~6 it/s x 1024 rays for monosdf-class hash-grid pipelines). The driver
target is >= 2x A100, so vs_baseline >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# the full train step takes minutes to AOT-compile through the remote
# relay; the persistent cache makes every subsequent bench run start fast
import holoscene_tpu

holoscene_tpu.setup_compile_cache()

from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.fields import (
    ImplicitNetworkConfig,
    RenderingNetworkConfig,
)
from holoscene_tpu.models.holoscene import HoloSceneConfig, init_holoscene
from holoscene_tpu.ops.sampler import SamplerConfig
from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

A100_REFERENCE_RAYS_PER_SEC = 6000.0  # estimated reference Stage-1 rate
# estimated gsplat fwd+bwd on A100 at the Stage-4 workload shapes (100k
# mesh-anchored gaussians, 512^2 full-frame): ~10 ms/step => 10 M splats/s.
# The reference publishes no number (BASELINE.md); target is >= 2x this.
A100_REFERENCE_SPLATS_PER_SEC = 10e6
TARGET_MULTIPLIER = 2.0
NUM_RAYS = int(os.environ.get("BENCH_RAYS", "1024"))
WARMUP_STEPS = 3
TIMED_STEPS = 20


def flagship_config() -> HoloSceneConfig:
    return HoloSceneConfig(
        implicit=ImplicitNetworkConfig(
            feature_vector_size=256, d_out=32, dims=(256, 256), multires=6,
            # 16 levels is the reference workload shape (BASELINE.md);
            # BENCH_NUM_LEVELS is an A/B knob only — any shipped change
            # must pass the flagship quality gate first
            num_levels=int(os.environ.get("BENCH_NUM_LEVELS", "16")),
            level_dim=2, base_size=16, end_size=2048, logmap=19,
            color_grid_feature=True, divide_factor=1.0, sigmoid=10.0,
            fused_dual_grid=os.environ.get("BENCH_DUAL", "1") == "1",
            grid_interp=os.environ.get("BENCH_INTERP", "trilinear"),
            # levels with resolution <= this store full dense tables and ride
            # the one-row-per-cell block gather path (ops/hashgrid.py)
            dense_max_res=int(os.environ.get("BENCH_DENSE_MAX_RES", "0")),
            fused_fetch=os.environ.get("BENCH_FUSED_FETCH", "packed"),
            # stochastic one-corner color-grid backward (unbiased; see
            # ops/hashgrid.py color_bwd="sampled"); quality-gated default
            color_bwd_sample=(cb := os.environ.get("BENCH_COLOR_BWD", "1") == "1"),
            # sdf sampling extends color sampling (fields.py __post_init__)
            sdf_bwd_sample=cb and os.environ.get("BENCH_SDF_BWD", "1") == "1",
        ),
        rendering=RenderingNetworkConfig(
            feature_vector_size=256, dims=(256, 256), multires_view=4,
            multires_point=4, multires_normal=4,
        ),
        sampler=SamplerConfig(
            N_samples=64,
            # 128 is the reference workload shape; the knob exists for the
            # occupancy-restricted A/B (fewer eval probes on a tighter
            # interval) — any shipped change needs the train gate first
            N_samples_eval=int(os.environ.get("BENCH_EVAL_SAMPLES", "128")),
            N_samples_extra=32,
            eps=0.1, beta_iters=10,
            # upsample rounds; reference default 5. 4 rounds match 5 on
            # sample placement (offline probe) and passed the combined
            # 2500-iter train gate with the tiered fine levels (PERF.md)
            max_total_iters=int(os.environ.get("BENCH_SAMPLER_ITERS", "4")),
        ),
        use_bg_reg=False,  # hot-loop iteration (bg patch runs every 10th)
        # coarse-level SDF probes for sample placement (render stays exact);
        # halves the sampler's gather traffic — see HoloSceneConfig
        sampler_grid_levels=int(os.environ.get("BENCH_SAMPLER_LEVELS", "8")),
        # env overrides for A/B profiling (bench defaults are the shipped
        # fast path)
        forward_grad_mode=os.environ.get("BENCH_GRAD_MODE", "fused"),
        # top-56 of 98: both this keep ratio (0.57) and 0.65 are
        # quality-validated on hardware (eval PSNR 35.60 / 35.78 vs 35.8 dB
        # unpruned, chamfer parity; scripts/tpu_quality_run.py)
        render_top_m=int(os.environ.get("BENCH_TOP_M", "56")),
        # tiered fine levels: top-F of the kept M get all 16 levels, the
        # tail gets the 8 coarse levels (holoscene.py render_fine_top_f);
        # offline error probe: PERF.md round-2 (0 = off)
        render_fine_top_f=int(os.environ.get("BENCH_FINE_TOP_F", "32")),
        render_fine_levels=int(os.environ.get("BENCH_FINE_LEVELS", "6")),
        # occupancy-grid sampling restriction (ops/occupancy.py): OPT-IN —
        # the 2500-iter gate improved but the 512²/10k flagship run showed
        # an eval-quality collapse (unsupervised excluded regions drift;
        # PERF.md r4). Re-gate with the full-coverage mitigation before
        # flipping this back on.
        use_occupancy=os.environ.get("BENCH_OCC", "0") == "1",
        # baked probe grid (ops/probe_grid.py): sampler placement proxy,
        # re-baked every BENCH_PROBE_EVERY steps (bake cost is part of the
        # reported rate). SHIPPED DEFAULT-ON after both gates passed:
        # 2500-iter gate 35.58 dB + chamfer better-than-band (r5c), and
        # the 512²/10k flagship at parity (train 38.23 / test 37.42 vs the
        # r3 anneal baseline 38.78/36.52) at this exact cadence — the
        # full-scale validation the occupancy collapse taught us to demand
        # for sampling-policy changes. +16% rays/s (5063 -> 5851).
        probe_grid_res=int(os.environ.get("BENCH_PROBE_GRID", "128")),
        probe_update_every=int(os.environ.get("BENCH_PROBE_EVERY", "64")),
    )


def make_batch(key, n_rays: int, img_res: int = 512):
    ks = jax.random.split(key, 4)
    f = 0.5 * img_res / np.tan(np.radians(35.0))
    intr = jnp.array(
        [[f, 0.0, img_res / 2], [0.0, f, img_res / 2], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )
    pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.4, 0.1, -0.4]))
    uv = jax.random.uniform(ks[0], (n_rays, 2), minval=0.0, maxval=img_res)
    return {
        "uv": uv,
        "pose": pose,
        "intrinsics": intr,
        "rgb": jax.random.uniform(ks[1], (n_rays, 3)),
        "depth": jax.random.uniform(ks[2], (n_rays, 1), minval=0.5, maxval=2.0),
        "normal": jax.nn.standardize(jax.random.normal(ks[3], (n_rays, 3))),
        "segs": jnp.zeros((n_rays,), dtype=jnp.int32),
        "mask": jnp.ones((n_rays, 1)),
    }


def make_splat_scene(n: int = 100_000, res: int = 512):
    """The Stage-4 bench scene: n mesh-anchored gaussians on a floor plane
    + two spheres (GoM-like surface splats), 512^2 camera, random target.
    Returns (params dict, quats, viewmat, intr, tgt) — shared by bench_stage4
    and the splat probe scripts so every measurement sees the same scene."""
    rng = np.random.default_rng(0)
    n_floor = n * 6 // 10
    floor = np.stack(
        [rng.uniform(-1, 1, n_floor), np.full(n_floor, 0.5),
         rng.uniform(-1, 1, n_floor)], axis=-1,
    )
    n_sph = n - n_floor
    u = rng.normal(size=(n_sph, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    centers = np.where(
        (np.arange(n_sph) % 2 == 0)[:, None],
        np.array([[-0.4, 0.2, 0.0]]), np.array([[0.45, 0.3, 0.2]]),
    )
    sph = centers + u * 0.28
    means = np.concatenate([floor, sph]).astype(np.float32)
    spacing = float(np.sqrt(8.0 / n))  # ~sqrt(total area / N)
    params = {
        "means": jnp.asarray(means),
        "scales": jnp.asarray(
            np.log(rng.uniform(0.8, 1.6, (n, 3)) * spacing).astype(np.float32)
        ),
        "opac": jnp.asarray(rng.normal(1.5, 0.5, n).astype(np.float32)),
        "colors": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    }
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    intr = jnp.array(
        [[res * 0.9, 0, res / 2], [0, res * 0.9, res / 2], [0, 0, 1.0]]
    )
    tgt = jnp.asarray(rng.uniform(0, 1, (res, res, 3)).astype(np.float32))
    return params, quats, viewmat, intr, tgt


def bench_stage4(n: int = 100_000, res: int = 512, timed_steps: int = 20):
    """Stage-4 fused splat train-step throughput (splats/s) at the flagship
    shapes: 100k mesh-anchored gaussians, 512^2 full-frame render, fwd+bwd
    through the Pallas compositing kernels (make_splat_scene). Flat path:
    EXACT compositing with amortized binning; topk path: saturation-
    calibrated K (ops/splat.py calibrate_max_per_tile)."""
    from holoscene_tpu.ops.splat import (
        auto_max_per_tile,
        calibrate_max_per_tile,
        render_gaussians,
        tile_overlap_counts,
    )

    params, quats, viewmat, intr, tgt = make_splat_scene(n, res)

    if os.environ.get("BENCH_SPLAT_PATH", "flat") == "flat":
        # shipped default: flat sorted-candidate pipeline with amortized
        # binning — EXACT compositing (no K truncation/calibration); the
        # index plan refreshes every BENCH_REBIN_EVERY steps INSIDE the
        # timed loop (the per-frame-visit cadence the stage-4 trainer uses)
        from holoscene_tpu.ops.gaussians import (
            covariance_3d,
            project_gaussians,
        )
        from holoscene_tpu.ops.splat_flat import build_flat_bins, plan_flat

        # 16 gated by the 16-STEP staleness test (test_splat_flat) and
        # measured +3% over 8 (r4: 5.07 vs 4.92 M splats/s). The TRAINER
        # keeps rebin_every=8 per-frame VISITS — a visit cadence spans more
        # optimizer steps of drift than the bench's single-frame cadence.
        rebin_every = int(os.environ.get("BENCH_REBIN_EVERY", "16"))
        tiles = res // 16

        def _proj(p):
            cov3d = covariance_3d(quats, jnp.exp(p["scales"]))
            return project_gaussians(
                p["means"], cov3d, viewmat, intr, res, res)

        xy0, _, conic0, _, valid0 = jax.jit(_proj)(params)
        plan = plan_flat(xy0, conic0, jax.nn.sigmoid(params["opac"]),
                         valid0, tiles, tiles, 16)

        used0 = None
        if os.environ.get("BENCH_SPLAT_TRIM", "1") == "1":
            # saturation-trimmed plan (ops/splat_flat.py): one probe render
            # under the full plan yields per-tile walked-chunk counts; the
            # trimmed plan stops gathering payload behind the saturation
            # depth. Output stays exact (stale flag guards drift).
            from holoscene_tpu.ops.splat_flat import plan_trimmed

            @jax.jit
            def _probe(p):
                xy, depth, conic, _, valid = _proj(p)
                bins = build_flat_bins(
                    xy, depth, conic, jax.nn.sigmoid(p["opac"]), valid,
                    tiles_x=tiles, tiles_y=tiles, tile_size=16, plan=plan)
                out = render_gaussians(
                    p["means"], quats, jnp.exp(p["scales"]),
                    jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
                    width=res, height=res, tile_size=16, flat_plan=plan,
                    flat_bins=bins)
                return out["used_chunks"], bins["tile_chunk_cnt"]

            used0, cnt0 = _probe(params)
            plan = plan_trimmed(plan, cnt0, used0, trim_slack=2)

        @jax.jit
        def rebin(p):
            xy, depth, conic, _, valid = _proj(p)
            return build_flat_bins(
                xy, depth, conic, jax.nn.sigmoid(p["opac"]), valid,
                tiles_x=tiles, tiles_y=tiles, tile_size=16, plan=plan,
                used_chunks=used0)

        tgt_chw = tgt.transpose(2, 0, 1)  # trainer-layout target [3,H,W]

        def loss(p, bins):
            out = render_gaussians(
                p["means"], quats, jnp.exp(p["scales"]),
                jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
                width=res, height=res, tile_size=16, flat_plan=plan,
                flat_bins=bins, chw=True,
            )
            return jnp.mean((out["rgb"] - tgt_chw) ** 2)

        step = jax.jit(jax.grad(loss))
        bins = rebin(params)
        g = step(params, bins)
        _ = float(g["means"][0, 0])  # compile + readback
        t0 = time.perf_counter()
        for _i in range(timed_steps):
            if _i % rebin_every == 0:
                bins = rebin(params)
            g = step(params, bins)
        _ = float(g["means"][0, 0])
        dt = time.perf_counter() - t0
        return n * timed_steps / dt, -rebin_every  # K slot reports -R

    counts = tile_overlap_counts(
        params["means"], quats, jnp.exp(params["scales"]), viewmat, intr,
        res, res,
    )
    k_geom = auto_max_per_tile(np.asarray(counts))

    def render_k(k):
        return render_gaussians(
            params["means"], quats, jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opac"]), params["colors"], viewmat, intr,
            width=res, height=res, tile_size=16, max_per_tile=k,
        )["rgb"]

    k = calibrate_max_per_tile(render_k, hi=k_geom)

    def loss(p):
        out = render_gaussians(
            p["means"], quats, jnp.exp(p["scales"]),
            jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
            width=res, height=res, tile_size=16, max_per_tile=k,
        )
        return jnp.mean((out["rgb"] - tgt) ** 2)

    step = jax.jit(jax.grad(loss))
    g = step(params)
    _ = float(g["means"][0, 0])  # force readback through the relay
    t0 = time.perf_counter()
    for _i in range(timed_steps):
        g = step(params)
    _ = float(g["means"][0, 0])
    dt = time.perf_counter() - t0
    return n * timed_steps / dt, k


def _stage4_rows(n: int = 100_000):
    """stage4 bench row + the dp8-projected row (VERDICT r4 #3): measured
    1-chip step + analytic ring all-reduce of the splat param tree over ICI
    (same projection model as the stage-1 dp8 row — frames shard over
    `data`, one grad psum per step; the sharded step itself is validated by
    dryrun_multichip's stage-4 pass and tests/test_stage4_dp.py)."""
    splats_per_sec, k_auto = bench_stage4(n)
    row = {
        "metric": "stage4_splats_per_sec",
        "value": round(splats_per_sec, 1),
        "unit": "splats/s",
        "vs_baseline": round(
            splats_per_sec
            / (TARGET_MULTIPLIER * A100_REFERENCE_SPLATS_PER_SEC), 4),
    }
    if k_auto < 0:
        row["splat_path"] = "flat"
        row["rebin_every"] = -k_auto
    else:
        row["auto_max_per_tile"] = k_auto
    rows = [row]
    if os.environ.get("BENCH_DP_PROJECTION", "1") == "1":
        grad_bytes = n * 10 * 4  # means3+scales3+opac1+colors3 fp32
        step_s = n / splats_per_sec
        n_dev = 8
        coll_s = 2 * grad_bytes * (n_dev - 1) / n_dev / (45e9 * 2)
        dp_rate = n_dev * n / (step_s + coll_s)
        rows.append({
            "metric": "stage4_dp8_projected_splats_per_sec",
            "value": round(dp_rate, 1),
            "unit": "splats/s",
            "vs_baseline": round(
                dp_rate / (TARGET_MULTIPLIER * A100_REFERENCE_SPLATS_PER_SEC),
                4),
            "projection": "1-chip measured step + analytic ring allreduce",
            "collective_ms": round(coll_s * 1e3, 3),
        })
    return rows


def _main():
    if os.environ.get("BENCH_SKIP_STAGE1", "0") == "1":
        # splat-only A/B mode: report stage4 as the primary metric
        rows = _stage4_rows()
        rows[0]["extra_metrics"] = rows[1:]
        print(json.dumps(rows[0]))
        return

    cfg = flagship_config()
    lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0, reg_vio_weight=0.01)
    key = jax.random.PRNGKey(0)
    key, k_init, k_batch = jax.random.split(key, 3)

    params = init_holoscene(k_init, cfg)
    optimizer = make_optimizer(5e-4, 20.0, 200000)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, lcfg, optimizer)
    batch = make_batch(k_batch, NUM_RAYS)

    occ = None
    occ_every = int(os.environ.get("BENCH_OCC_EVERY", "8"))
    if cfg.use_occupancy:
        from holoscene_tpu.ops.occupancy import init_occ_grid

        occ = init_occ_grid(cfg.occupancy)

    probe_bake = None
    probe = [None]
    if cfg.probe_grid_res > 0:
        from holoscene_tpu.models.holoscene import make_probe_bake

        probe_bake = make_probe_bake(cfg)

    gstep = [0]  # global step counter: warmup + timed share the re-bake
    # cadence (the timed loop's i resets, which would double-bake at i=0)

    def run_step(p, o, k, i, occ):
        if probe_bake is not None and (
                probe[0] is None or gstep[0] % cfg.probe_update_every == 0):
            probe[0] = probe_bake(p)
        gstep[0] += 1
        if occ is None:
            p, o, m = step(p, o, k, batch, i, call_reg=True, with_bg=False,
                           probe=probe[0])
            return p, o, m, None
        return step(p, o, k, batch, i, call_reg=True, with_bg=False,
                    occ=occ, update_occ=i % occ_every == 0, probe=probe[0])

    for i in range(WARMUP_STEPS):
        key, k = jax.random.split(key)
        params, opt_state, metrics, occ = run_step(params, opt_state, k, i,
                                                   occ)
    # host readback forces the full chain (block_until_ready is unreliable
    # through remote-execution relays)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        key, k = jax.random.split(key)
        params, opt_state, metrics, occ = run_step(params, opt_state, k, i,
                                                   occ)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = NUM_RAYS * TIMED_STEPS / dt

    extra = []
    # dp-projected multi-chip rate (VERDICT r3 #4): per-chip step time at
    # the shipped batch plus the analytic ring all-reduce of the gradient
    # pytree over ICI (v5e ~45 GB/s/link, bidirectional ring — the same
    # model the measured probe_dp_batch.py projection uses; its measured
    # 4096-ray single-chip row put dp-4 efficiency at 93%). This is a
    # PROJECTION — one real chip exists on this box; the sharded step
    # itself is validated by dryrun_multichip on a virtual mesh.
    if os.environ.get("BENCH_DP_PROJECTION", "1") == "1":
        grad_bytes = sum(
            np.prod(x.shape) * 4 for x in jax.tree_util.tree_leaves(params))
        step_s = dt / TIMED_STEPS
        for n_dev in (8,):
            coll_s = 2 * grad_bytes * (n_dev - 1) / n_dev / (45e9 * 2)
            dp_rate = n_dev * NUM_RAYS / (step_s + coll_s)
            extra.append({
                "metric": f"stage1_dp{n_dev}_projected_rays_per_sec",
                "value": round(dp_rate, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    dp_rate / (TARGET_MULTIPLIER * A100_REFERENCE_RAYS_PER_SEC),
                    4),
                "projection": "1-chip measured step + analytic ring allreduce",
                "collective_ms": round(coll_s * 1e3, 2),
            })
    if os.environ.get("BENCH_SKIP_STAGE4", "0") != "1":
        extra.extend(_stage4_rows())

    print(
        json.dumps(
            {
                "metric": "stage1_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    rays_per_sec / (TARGET_MULTIPLIER * A100_REFERENCE_RAYS_PER_SEC), 4
                ),
                "extra_metrics": extra,
            }
        )
    )


def main():
    # serialize against any other chip job (probes, queue runs): an
    # overlapped bench records garbage (PERF.md pitfall #1; BENCH_r03
    # landed mid-probe). Waits for the running job, then measures alone.
    from holoscene_tpu.utils.chiplock import chip_lock

    with chip_lock("bench.py", wait=True,
                   timeout_s=float(os.environ.get("BENCH_LOCK_TIMEOUT", "7200"))):
        _main()


if __name__ == "__main__":
    main()
