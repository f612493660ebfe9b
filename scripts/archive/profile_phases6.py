"""Post-sampled-backward phase attribution: where do the remaining
~224 ms/step go at bench shapes (1024 rays, top-56 -> 57k render pts)?

Phases measured scan-amortized (k=9 vs k=1 delta; x perturbed by the carry
so gathers stay in the loop). Sync via host readback of a jitted reduce —
block_until_ready is a NO-OP under the axon relay (PERF.md pitfall #5).
Run ALONE on the TPU (PERF.md rule #1).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import holoscene_tpu  # noqa: E402

holoscene_tpu.setup_compile_cache()

from bench import flagship_config, make_batch  # noqa: E402
from holoscene_tpu.models.fields import (  # noqa: E402
    implicit_all_gradients,
    implicit_get_outputs_fused,
)
from holoscene_tpu.models.holoscene import (  # noqa: E402
    get_beta,
    init_holoscene,
    render_rays,
    scene_sdf_nograd,
)
from holoscene_tpu.ops.sampler import error_bound_sample  # noqa: E402

cfg = flagship_config()
params = init_holoscene(jax.random.PRNGKey(0), cfg)
NRAYS = 1024
NPTS = NRAYS * (cfg.render_top_m or 98)
K = 9


def scanned(body):
    """k-amortized: per-iter cost = (T(k=K) - T(k=1)) / (K-1)."""

    def make(k):
        @jax.jit
        def run(x0):
            def step(x, _):
                out = body(x)
                # fold a dependency back into x so nothing hoists
                leaves = jax.tree_util.tree_leaves(out)
                delta = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return x + delta * 1e-20, None

            x, _ = jax.lax.scan(step, x0, None, length=k)
            return x

        return run

    return make(K), make(1)


def phase(name, body, x0):
    fk, f1 = scanned(body)
    t0 = time.perf_counter()
    float(jnp.sum(fk(x0))); float(jnp.sum(f1(x0)))
    compile_s = time.perf_counter() - t0
    ts_k, ts_1 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(fk(x0)))
        ts_k.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(f1(x0)))
        ts_1.append(time.perf_counter() - t0)
    ms = (min(ts_k) - min(ts_1)) / (K - 1) * 1000
    print(f"{name:58s} {ms:8.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (NPTS, 3), minval=-0.9, maxval=0.9)

    ip = params["implicit"]
    seed = jnp.float32(1.234)

    # 1. fused forward (feats+J+cf)
    phase("fused fwd (57k pts)", lambda x: implicit_get_outputs_fused(
        ip, cfg.implicit, x), x0)

    # 2. full fused grad, exact vs sampled vs sampled_all
    import dataclasses
    for name, c, s in (
        ("exact", False, False), ("color sampled", True, False),
        ("sampled_all", True, True),
    ):
        icfg = dataclasses.replace(
            cfg.implicit, color_bwd_sample=c, sdf_bwd_sample=s
        )

        def lossf(x, icfg=icfg):
            def inner(p):
                sdf, fv, g, sem, raw = implicit_get_outputs_fused(
                    p, icfg, x, grad_seed=seed
                )
                return (sdf.sum() + fv.sum() + (g * g).sum() + sem.sum())

            return jax.grad(inner)(ip)

        phase(f"fused param grad [{name}]", lossf, x0)

    # 3. sampler (full error-bound, bench shapes)
    rays_o0 = jnp.zeros((NRAYS, 3)) + jnp.array([0.4, 0.1, -0.4])

    def sampler_body(o):
        d = jax.nn.standardize(
            o + jnp.array([0.1, -0.2, 1.0]), axis=-1
        )
        z, _ = error_bound_sample(
            jax.random.PRNGKey(1), o, d, scene_sdf_nograd(params, cfg),
            jax.lax.stop_gradient(get_beta(params, cfg)), cfg.sampler,
            training=True,
        )
        return z

    phase("error-bound sampler (1024 rays)", sampler_body, rays_o0)

    # 4. eikonal path: all-object gradients at 4R pts
    xe0 = jax.random.uniform(key, (4 * NRAYS, 3), minval=-0.9, maxval=0.9)
    phase("implicit_all_gradients (4096 pts)", lambda x:
          implicit_all_gradients(ip, cfg.implicit, x), xe0)

    # 5. full render_rays fwd+bwd (the whole training forward), jitted
    batch_key = jax.random.PRNGKey(7)
    rays_d = jax.nn.standardize(
        jax.random.normal(batch_key, (NRAYS, 3)), axis=-1
    )

    def full_body(o):
        def inner(p):
            out = render_rays(
                p, cfg, jax.random.PRNGKey(3), o, rays_d,
                jnp.ones((NRAYS, 1)), jnp.eye(3), training=True,
            )
            return (out["rgb_values"].sum() + out["normal_map"].sum()
                    + out["grad_theta"].sum() + out["sample_sdf"].sum())

        return jax.grad(inner)(params)

    phase("render_rays full fwd+bwd (1024 rays)", full_body, rays_o0)


if __name__ == "__main__":
    main()
