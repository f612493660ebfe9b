"""Round-2 phase attribution: vjp vs fused get_outputs, packed vs raw
fetches — scan-amortized (k=9 vs k=1 delta; input perturbed by the carry so
XLA cannot hoist loop-invariant work). Run ALONE on the TPU."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import holoscene_tpu  # noqa: E402

holoscene_tpu.setup_compile_cache()

from bench import flagship_config  # noqa: E402
from holoscene_tpu.models.fields import (  # noqa: E402
    implicit_get_outputs,
    implicit_get_outputs_fused,
)
from holoscene_tpu.models.holoscene import init_holoscene  # noqa: E402
from holoscene_tpu.ops.hashgrid import (  # noqa: E402
    hash_encode_dual,
    hash_encode_fused_dual,
)

cfg = flagship_config()
icfg = cfg.implicit
params = init_holoscene(jax.random.PRNGKey(0), cfg)["implicit"]
NPTS = 1024 * (cfg.render_top_m or 98)
pts = jax.random.uniform(jax.random.PRNGKey(3), (NPTS, 3), minval=-0.8,
                         maxval=0.8)
print(f"dense_max_res={icfg.dense_max_res} rows={icfg.grid_meta.table_rows} "
      f"npts={NPTS}", flush=True)


def timed(name, fn):
    def runner(k):
        @jax.jit
        def go(x):
            def body(acc, _):
                return acc + fn(x + acc * 1e-20), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=k)
            return acc
        return go

    try:
        lo, hi = runner(1), runner(9)
        _ = float(lo(pts)); _ = float(hi(pts))

        def t(g, iters=4):
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(g(pts))
            return (time.perf_counter() - t0) / iters

        dt = (t(hi) - t(lo)) / 8.0
        print(f"{name:52s} {dt*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


x01 = (pts + 1.0) * 0.5

# fused op (raw takes) forward / param grad
timed("fused_dual fwd (fa+Ja+fb)", lambda x: sum(
    jnp.sum(o) for o in hash_encode_fused_dual(
        (x + 1) * 0.5, params["grid"], params["color_grid"], icfg.grid_meta)))
timed("fused_dual fwd feats only", lambda x: sum(
    jnp.sum(o) for o in hash_encode_fused_dual(
        (x + 1) * 0.5, params["grid"], params["color_grid"],
        icfg.grid_meta)[::2]))
timed("fused_dual param grad (feats ct only)", lambda x: sum(
    jnp.sum(g) for g in jax.grad(
        lambda a, b: sum(jnp.sum(o) for o in hash_encode_fused_dual(
            (x + 1) * 0.5, a, b, icfg.grid_meta)[::2]),
        argnums=(0, 1),
    )(params["grid"], params["color_grid"])))
timed("fused_dual param grad (feats+J ct)", lambda x: sum(
    jnp.sum(g) for g in jax.grad(
        lambda a, b: sum(jnp.sum(o) for o in hash_encode_fused_dual(
            (x + 1) * 0.5, a, b, icfg.grid_meta)),
        argnums=(0, 1),
    )(params["grid"], params["color_grid"])))

# old packed machinery for comparison
timed("packed hash_encode_dual fwd", lambda x: sum(
    jnp.sum(o) for o in hash_encode_dual(
        (x + 1) * 0.5, params["grid"], params["color_grid"], icfg.grid_meta)))
timed("packed hash_encode_dual param grad", lambda x: sum(
    jnp.sum(g) for g in jax.grad(
        lambda a, b: sum(jnp.sum(o) for o in hash_encode_dual(
            (x + 1) * 0.5, a, b, icfg.grid_meta)), argnums=(0, 1),
    )(params["grid"], params["color_grid"])))

# full get_outputs variants
timed("get_outputs[vjp] fwd", lambda x: jnp.sum(
    implicit_get_outputs(params, icfg, x)[2]))
timed("get_outputs[fused] fwd", lambda x: jnp.sum(
    implicit_get_outputs_fused(params, icfg, x)[2]))
timed("get_outputs[vjp] FULL grad", lambda x: sum(
    jnp.sum(g) for g in jax.tree_util.tree_leaves(jax.grad(
        lambda p: jnp.sum(implicit_get_outputs(p, icfg, x)[2] ** 2)
        + jnp.sum(implicit_get_outputs(p, icfg, x)[0] ** 2)
    )(params))))
timed("get_outputs[fused] FULL grad", lambda x: sum(
    jnp.sum(g) for g in jax.tree_util.tree_leaves(jax.grad(
        lambda p: jnp.sum(implicit_get_outputs_fused(p, icfg, x)[2] ** 2)
        + jnp.sum(implicit_get_outputs_fused(p, icfg, x)[0] ** 2)
    )(params))))
