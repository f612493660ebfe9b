"""Decompose the implicit_get_outputs gradient cost (the 224 ms beyond the
raw encode grad found by profile_phases3). Variants isolate: second-order
vs first-order, the gradients-output term, the color branch, and the MLP.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import flagship_config  # noqa: E402
from holoscene_tpu.models.fields import (  # noqa: E402
    implicit_forward,
    implicit_get_outputs,
)
from holoscene_tpu.models.holoscene import init_holoscene  # noqa: E402

cfg = flagship_config()
icfg = cfg.implicit
params = init_holoscene(jax.random.PRNGKey(0), cfg)["implicit"]
NPTS = 65536
pts = jax.random.uniform(jax.random.PRNGKey(3), (NPTS, 3), minval=-0.8,
                         maxval=0.8)
key = jax.random.PRNGKey(1)


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


def grad_sum(loss_fn):
    return sum(
        jnp.sum(x) for x in jax.tree_util.tree_leaves(jax.grad(loss_fn)(params))
    )


# A. first-order only: grad of forward outputs (no gradient-output term)
timed("A fwd-outputs grad (1st order)", lambda x: grad_sum(
    lambda p: sum(jnp.sum(o ** 2) for o in implicit_forward(icfg=None, params=p, x=x)  # noqa
                  ) if False else (
        lambda sr_f: jnp.sum(sr_f[0] ** 2) + jnp.sum(sr_f[1] ** 2)
    )(implicit_forward(p, icfg, x))))

# B. full get_outputs grad but gradients term STOPPED (still builds pullback)
timed("B get_outputs grad, stop_grad(gradients)", lambda x: grad_sum(
    lambda p: (lambda o: jnp.sum(o[0] ** 2) + jnp.sum(o[1] ** 2)
               + jnp.sum(jax.lax.stop_gradient(o[2]) ** 2))(
        implicit_get_outputs(p, icfg, x))))

# C. full second-order (gradients in the loss) — the reference case
timed("C get_outputs grad incl gradients^2 (2nd)", lambda x: grad_sum(
    lambda p: (lambda o: jnp.sum(o[2] ** 2))(implicit_get_outputs(p, icfg, x))))

# D. second-order but WITHOUT the color branch in the loss path
import dataclasses  # noqa: E402
icfg_nocolor = dataclasses.replace(icfg, color_grid_feature=False,
                                   fused_dual_grid=False)
params_nc = init_holoscene(
    jax.random.PRNGKey(0),
    dataclasses.replace(cfg, implicit=icfg_nocolor))["implicit"]


def grad_sum_nc(loss_fn):
    return sum(
        jnp.sum(x)
        for x in jax.tree_util.tree_leaves(jax.grad(loss_fn)(params_nc))
    )


timed("D same, color grid OFF", lambda x: grad_sum_nc(
    lambda p: (lambda o: jnp.sum(o[2] ** 2))(
        implicit_get_outputs(p, icfg_nocolor, x))))

# E. pure-MLP second-order (no hash grid at all)
icfg_mlp = dataclasses.replace(icfg, use_grid_feature=False,
                               color_grid_feature=False,
                               fused_dual_grid=False)
params_mlp = init_holoscene(
    jax.random.PRNGKey(0), dataclasses.replace(cfg, implicit=icfg_mlp))[
    "implicit"]


def grad_sum_mlp(loss_fn):
    return sum(
        jnp.sum(x)
        for x in jax.tree_util.tree_leaves(jax.grad(loss_fn)(params_mlp))
    )


timed("E same, pure MLP (no grids)", lambda x: grad_sum_mlp(
    lambda p: (lambda o: jnp.sum(o[2] ** 2))(
        implicit_get_outputs(p, icfg_mlp, x))))
