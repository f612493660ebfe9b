import time, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from bench import flagship_config, make_batch
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.holoscene import init_holoscene, render_rays, scene_sdf_nograd, get_beta
from holoscene_tpu.models.fields import implicit_forward, implicit_all_gradients, implicit_get_outputs
from holoscene_tpu.ops.sampler import error_bound_sample
from holoscene_tpu.ops.hashgrid import hash_encode
from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

cfg = flagship_config()
key = jax.random.PRNGKey(0)
params = init_holoscene(key, cfg)
batch = make_batch(key, 1024)

def bench_fn(name, f, *args, n=3):
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:42s} compile+1 {time.perf_counter()-t0:7.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1000:9.1f} ms", flush=True)

N = 1024*128
pts = jax.random.uniform(key, (N,3), minval=0.0, maxval=1.0)
f_hash = jax.jit(lambda p, x: hash_encode(x, p["implicit"]["grid"], cfg.implicit.grid_meta).sum(axis=0))
bench_fn(f"hash_encode [{N}]", f_hash, params, pts)

f_fwd = jax.jit(lambda p, x: implicit_forward(p["implicit"], cfg.implicit, x, with_features=False)[0].sum(axis=0))
bench_fn(f"sdf fwd (no color) [{N}]", f_fwd, params, pts)

o = jnp.tile(jnp.array([[0.3, 0.1, -0.4]]), (1024,1))
th = jnp.linspace(-0.5, 0.5, 1024)
d = jnp.stack([jnp.sin(th), jnp.zeros(1024), jnp.cos(th)], -1)
f_samp = jax.jit(lambda p, k: error_bound_sample(k, o, d, scene_sdf_nograd(p, cfg),
    jax.lax.stop_gradient(get_beta(p, cfg)), cfg.sampler, training=True)[0].sum(axis=0))
bench_fn("error_bound_sample [1024]", f_samp, params, key)

N2 = 1024*98
pts2 = jax.random.uniform(key, (N2,3), minval=-0.9, maxval=0.9)
f_out = jax.jit(lambda p, x: implicit_get_outputs(p["implicit"], cfg.implicit, x)[2].sum(axis=0))
bench_fn(f"get_outputs (fwd+grad) [{N2}]", f_out, params, pts2)

N3 = 4096
pts3 = jax.random.uniform(key, (N3,3), minval=-0.9, maxval=0.9)
f_jac = jax.jit(lambda p, x: implicit_all_gradients(p["implicit"], cfg.implicit, x).sum(axis=0))
bench_fn(f"all_gradients jvp x3 [{N3}]", f_jac, params, pts3)

f_render = jax.jit(lambda p, k: render_rays(p, cfg, k, o, d, jnp.ones((1024,1)), jnp.eye(3), training=True)["rgb_values"].sum(axis=0))
bench_fn("render_rays full [1024]", f_render, params, key)

import optax
lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0)
optimizer = make_optimizer(5e-4, 20.0, 200000)
opt_state = optimizer.init(params)
step = make_train_step(cfg, lcfg, optimizer)
t0 = time.perf_counter()
params, opt_state, m = step(params, opt_state, key, batch, 0, call_reg=True, with_bg=False)
_ = float(m["loss"])
print(f"train step compile+1 {time.perf_counter()-t0:7.1f} s", flush=True)
t0 = time.perf_counter()
for i in range(3):
    params, opt_state, m = step(params, opt_state, key, batch, i, call_reg=True, with_bg=False)
    _ = float(m["loss"])
print(f"train step {(time.perf_counter()-t0)/3*1000:9.1f} ms", flush=True)
