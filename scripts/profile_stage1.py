"""Component-level timing of the Stage-1 hot path on the current backend."""

import time

import jax
import jax.numpy as jnp

from holoscene_tpu.models.fields import implicit_forward, implicit_get_outputs, init_implicit_network
from holoscene_tpu.models.holoscene import init_holoscene, scene_sdf_nograd, get_beta, render_rays
from holoscene_tpu.ops.hashgrid import hash_encode
from holoscene_tpu.ops.sampler import error_bound_sample

import sys
sys.path.insert(0, "/root/repo")
from bench import flagship_config  # noqa: E402


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1000:9.2f} ms")
    return dt


def main():
    cfg = flagship_config()
    key = jax.random.PRNGKey(0)
    params = init_holoscene(key, cfg)
    icfg = cfg.implicit

    n_pts = 1024 * 128
    pts = jax.random.uniform(key, (n_pts, 3), minval=-0.9, maxval=0.9)

    f_hash = jax.jit(lambda p, x: hash_encode((x + 1) * 0.5, p["implicit"]["grid"], icfg.grid_meta))
    timeit(f"hash_encode fwd [{n_pts}]", f_hash, params, pts)

    f_fwd = jax.jit(lambda p, x: implicit_forward(p["implicit"], icfg, x)[0])
    timeit(f"implicit_forward [{n_pts}]", f_fwd, params, pts)

    n_fwd = 1024 * 98
    pts2 = jax.random.uniform(key, (n_fwd, 3), minval=-0.9, maxval=0.9)
    f_out = jax.jit(lambda p, x: implicit_get_outputs(p["implicit"], icfg, x)[2])
    timeit(f"implicit_get_outputs (grad) [{n_fwd}]", f_out, params, pts2)

    rays_o = jnp.tile(jnp.array([[0.3, 0.1, -0.4]]), (1024, 1))
    theta = jnp.linspace(-0.5, 0.5, 1024)
    rays_d = jnp.stack([jnp.sin(theta), jnp.zeros(1024), jnp.cos(theta)], -1)

    f_samp = jax.jit(
        lambda p, k: error_bound_sample(
            k, rays_o, rays_d, scene_sdf_nograd(p, cfg),
            jax.lax.stop_gradient(get_beta(p, cfg)), cfg.sampler, training=True,
        )[0]
    )
    timeit("error_bound_sample [1024 rays]", f_samp, params, key)

    f_render = jax.jit(
        lambda p, k: render_rays(
            p, cfg, k, rays_o, rays_d, jnp.ones((1024, 1)), jnp.eye(3),
            training=True,
        )["rgb_values"]
    )
    timeit("render_rays full fwd [1024 rays]", f_render, params, key)

    f_render_bwd = jax.jit(
        jax.grad(
            lambda p, k: render_rays(
                p, cfg, k, rays_o, rays_d, jnp.ones((1024, 1)), jnp.eye(3),
                training=True,
            )["rgb_values"].sum()
        )
    )
    timeit("render_rays fwd+bwd [1024 rays]", f_render_bwd, params, key)


if __name__ == "__main__":
    main()
