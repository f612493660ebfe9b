"""Fine-grained Stage-1 step attribution at the flagship workload.

Respects BENCH_TOP_M / BENCH_DUAL / BENCH_GRAD_MODE like bench.py.
Scan-amortized timing (k calls chained inside one jit, delta of k=9 vs 1)
so the ~30 ms relay readback floor cancels.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from bench import flagship_config, make_batch  # noqa: E402
from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss  # noqa: E402
from holoscene_tpu.models.fields import (  # noqa: E402
    implicit_all_gradients,
    implicit_get_outputs,
)
from holoscene_tpu.models.holoscene import (  # noqa: E402
    get_beta,
    init_holoscene,
    render_rays,
    scene_sdf_nograd,
)
from holoscene_tpu.ops.hashgrid import hash_encode_dual  # noqa: E402
from holoscene_tpu.ops.sampler import error_bound_sample  # noqa: E402
from holoscene_tpu.training.stage1 import rays_from_batch  # noqa: E402

cfg = flagship_config()
key = jax.random.PRNGKey(0)
params = init_holoscene(key, cfg)
batch = make_batch(key, 1024)
lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0)
o, d, ds, w2c = jax.jit(
    lambda b: rays_from_batch(b["uv"], b["pose"], b["intrinsics"])
)(batch)

M = cfg.render_top_m if cfg.render_top_m else cfg.sampler.n_final
NPTS = 1024 * M
print(f"config: top_m={cfg.render_top_m} dual={cfg.implicit.fused_dual_grid} "
      f"grad={cfg.forward_grad_mode} -> {NPTS} render pts", flush=True)


def timed(name, fn, *args):
    """fn(key) -> scalar; chained k times inside one jit."""

    def runner(k):
        @jax.jit
        def go(key, *args):
            def body(carry, _):
                key, acc = carry
                key, sub = jax.random.split(key)
                return (key, acc + fn(sub, *args)), None

            (key, acc), _ = jax.lax.scan(body, (key, 0.0), None, length=k)
            return acc

        return go

    try:
        lo, hi = runner(1), runner(9)
        t0 = time.perf_counter()
        _ = float(lo(key, *args)); _ = float(hi(key, *args))
        compile_s = time.perf_counter() - t0

        def t(g, iters=4):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(key, *args))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:44s} {dt*1e3:8.1f} ms   (compile {compile_s:5.1f}s)",
              flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


pts = jax.random.uniform(jax.random.PRNGKey(3), (NPTS, 3), minval=-0.8,
                         maxval=0.8)

# 1. raw dual encode fwd at render point count
timed("encode_dual fwd (render pts)", lambda k: jnp.sum(
    hash_encode_dual((pts + 1) * 0.5, params["implicit"]["grid"],
                     params["implicit"]["color_grid"],
                     cfg.implicit.grid_meta)[0]))

# 2. its full param-gradient (scatter both tables)
timed("encode_dual grad (gather+scatter)", lambda k: jnp.sum(
    jax.grad(lambda g, c: sum(
        jnp.sum(x) for x in hash_encode_dual(
            (pts + 1) * 0.5, g, c, cfg.implicit.grid_meta)
    ))(params["implicit"]["grid"], params["implicit"]["color_grid"])))

# 3. implicit_get_outputs fwd (encode + MLPs + scene-SDF pullback)
timed("implicit_get_outputs fwd", lambda k: jnp.sum(
    implicit_get_outputs(params["implicit"], cfg.implicit, pts)[2]))

# 4. its full param gradient
timed("implicit_get_outputs grad", lambda k: sum(
    jnp.sum(x) for x in jax.tree_util.tree_leaves(jax.grad(
        lambda p: jnp.sum(implicit_get_outputs(p, cfg.implicit, pts)[2] ** 2)
    )(params["implicit"]))))

# 5. eikonal jacobians fwd+grad at 4096 pts
eik = jax.random.uniform(jax.random.PRNGKey(4), (4096, 3), minval=-1, maxval=1)
timed("implicit_all_gradients grad (eik)", lambda k: sum(
    jnp.sum(x) for x in jax.tree_util.tree_leaves(jax.grad(
        lambda p: jnp.sum(implicit_all_gradients(p, cfg.implicit, eik) ** 2)
    )(params["implicit"]))))

# 6. sampler alone
timed("sampler", lambda k: jnp.sum(error_bound_sample(
    k, o, d, scene_sdf_nograd(params, cfg),
    jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
    training=True)[0]))

# 7. render fwd / full grad
timed("render_rays fwd", lambda k: jnp.sum(
    render_rays(params, cfg, k, o, d, ds, w2c, training=True)["rgb_values"]))


def lossfn(p, k):
    out = render_rays(p, cfg, k, o, d, ds, w2c, training=True)
    gt = {kk: batch[kk] for kk in ("rgb", "depth", "normal", "segs", "mask")}
    return holoscene_loss(out, gt, lcfg, step=0, call_reg=True)["loss"]


timed("render fwd+loss+FULL grad", lambda k: sum(
    jnp.sum(x) for x in jax.tree_util.tree_leaves(
        jax.grad(lossfn)(params, k))))

# 8. searchsorted method comparison at sampler shapes (vmapped scan vs
# one-shot compare_all)
from functools import partial as _partial
cdf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (1024, 641)), axis=-1)
u = jax.random.uniform(jax.random.PRNGKey(6), (1024, 128))
for method in ("scan", "compare_all", "sort"):
    timed(f"searchsorted[{method}] 1024x641 q128", lambda k, m=method: jnp.sum(
        jax.vmap(_partial(jnp.searchsorted, side="right", method=m))(cdf, u)
        .astype(jnp.float32)))
