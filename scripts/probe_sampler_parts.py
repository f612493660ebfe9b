"""Sampler-internals attribution at flagship shapes (round-5 candidate #1):
where do the 78 ms go — probe SDF evals, the beta bisection, or the
fixed-width round machinery?

Times, each scan-amortized (k reps inside one jit, scalar-reduce sync):
  full        error_bound_sample with the real (8-level) probe sdf_fn
  sdf_probes  the T*E*R probe evaluations alone
  mach_b10    machinery with an analytic sphere sdf (beta_iters=10)
  mach_b1     same with beta_iters=1 (bisection share)
  mach_T1     T=1 (single round: no upsample rounds at all)

ATTRIBUTION ONLY (PERF.md pitfall: never build tables from these; the
end-to-end bench is the deliverable number).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import holoscene_tpu

holoscene_tpu.setup_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bench import flagship_config
from holoscene_tpu.models.holoscene import init_holoscene, scene_sdf_nograd
from holoscene_tpu.ops.sampler import SamplerConfig, error_bound_sample
from holoscene_tpu.utils.chiplock import chip_lock

R = int(os.environ.get("PROBE_RAYS", "1024"))
REPS = int(os.environ.get("PROBE_REPS", "20"))


def timed(tag, fn, *args):
    """scan-amortized: REPS calls inside one jit, delta vs 1 call."""
    def many(k, *a):
        def body(c, key):
            out = fn(key, *a)
            return c + jax.tree_util.tree_reduce(
                lambda s, x: s + jnp.sum(x.astype(jnp.float32)), out, 0.0), None
        keys = jax.random.split(k, REPS)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    one = jax.jit(lambda k, *a: many(k, *a))
    key = jax.random.PRNGKey(0)
    _ = float(one(key, *args))  # compile
    t0 = time.perf_counter()
    _ = float(one(key, *args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{tag:12s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cfg = flagship_config()
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    scfg = cfg.sampler
    T, E = scfg.max_total_iters, scfg.N_samples_eval
    print(f"R={R} T={T} E={E} W={T*E} beta_iters={scfg.beta_iters}",
          flush=True)

    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(
        np.tile([[0.3, 0.1, -0.4]], (R, 1)).astype(np.float32))
    th = np.linspace(-0.4, 0.4, R)
    rays_d = jnp.asarray(np.stack(
        [np.sin(th), rng.uniform(-0.1, 0.1, R), np.cos(th)],
        axis=-1).astype(np.float32))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    beta0 = jnp.asarray(0.01, jnp.float32)

    sdf_real = scene_sdf_nograd(params, cfg)
    sphere = lambda p: jnp.linalg.norm(p, axis=-1) - 0.7

    def sampler(sfn, sc):
        return lambda key: error_bound_sample(
            key, rays_o, rays_d, sfn, beta0, sc, training=True)

    timed("full", lambda k: sampler(sdf_real, scfg)(k))
    # proxy path: sampler over the baked probe grid + the bake itself
    from holoscene_tpu.ops.probe_grid import bake_probe_grid, probe_sdf_fn

    for res_pg in (128,):
        table = jax.jit(
            lambda: bake_probe_grid(sdf_real, res_pg, 1.0))()
        proxy = probe_sdf_fn(table, res_pg, 1.0)
        timed(f"full_pg{res_pg}", lambda k: sampler(proxy, scfg)(k))

        def bake_once(k):
            # perturb so the scan can't hoist the bake (pitfall #5)
            return bake_probe_grid(
                lambda p: sdf_real(p) + 0.0 * k[0], res_pg, 1.0)
        timed(f"bake_pg{res_pg}",
              lambda k: bake_once(jax.random.uniform(k, (1,))))
    # probe evals alone: T rounds x R*E points through the coarse-level SDF
    pts = jnp.asarray(rng.uniform(-1, 1, (T * R * E, 3)).astype(np.float32))
    timed("sdf_probes", lambda k: sdf_real(
        pts + 0.0 * jax.random.uniform(k, (1, 3))))
    timed("mach_b10", lambda k: sampler(sphere, scfg)(k))
    sc1 = dataclasses.replace(scfg, beta_iters=1)
    timed("mach_b1", lambda k: sampler(sphere, sc1)(k))
    scT1 = dataclasses.replace(scfg, max_total_iters=1)
    timed("mach_T1", lambda k: sampler(sphere, scT1)(k))
    # full step context: sampler share is (full / 204ms)
    print("done", flush=True)


if __name__ == "__main__":
    with chip_lock("probe_sampler_parts"):
        main()
