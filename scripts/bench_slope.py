import time, sys, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import flagship_config, make_batch
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.holoscene import init_holoscene
from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

cfg = flagship_config()
key = jax.random.PRNGKey(0)
params = init_holoscene(key, cfg)
batch = make_batch(key, 1024)
lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0)
optimizer = make_optimizer(5e-4, 20.0, 200000)
opt_state = optimizer.init(params)
step = make_train_step(cfg, lcfg, optimizer)

t0 = time.perf_counter()
params, opt_state, m = step(params, opt_state, key, batch, 0, call_reg=True, with_bg=False)
print(f"warmup loss={float(m['loss']):.4f} compile+1step: {time.perf_counter()-t0:.1f}s", flush=True)

for n in (3, 10, 20):
    t0 = time.perf_counter()
    for i in range(n):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, k, batch, i, call_reg=True, with_bg=False)
    v = float(m["loss"])  # single readback forces the whole chain
    dt = time.perf_counter() - t0
    print(f"n={n}: total {dt:.2f}s -> {n*1024/dt:.0f} rays/s", flush=True)
