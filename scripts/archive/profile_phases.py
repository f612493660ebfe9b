"""Break the train step into phases, each timed with readback."""
import time, sys, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import flagship_config, make_batch
from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss
from holoscene_tpu.models.holoscene import (init_holoscene, render_rays,
    scene_sdf_nograd, get_beta)
from holoscene_tpu.ops.sampler import error_bound_sample
from holoscene_tpu.training.stage1 import rays_from_batch

cfg = flagship_config()
key = jax.random.PRNGKey(0)
params = init_holoscene(key, cfg)
batch = make_batch(key, 1024)
lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0)

def bench(name, f, *args, n=3):
    t0 = time.perf_counter()
    out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:36s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.0f} ms", flush=True)

o, d, ds, w2c = jax.jit(lambda b: rays_from_batch(b["uv"], b["pose"], b["intrinsics"]))(batch)

# 1. sampler only
f1 = jax.jit(lambda p, k: error_bound_sample(k, o, d, scene_sdf_nograd(p, cfg),
    jax.lax.stop_gradient(get_beta(p, cfg)), cfg.sampler, training=True)[0].sum())
bench("sampler only", f1, params, key)

# 2. full render fwd (training=True, incl eikonal samples)
f2 = jax.jit(lambda p, k: render_rays(p, cfg, k, o, d, ds, w2c, training=True)["rgb_values"].sum())
bench("render fwd (train)", f2, params, key)

# 3. fwd + loss + grad
def lossfn(p, k):
    out = render_rays(p, cfg, k, o, d, ds, w2c, training=True)
    gt = {kk: batch[kk] for kk in ("rgb","depth","normal","segs","mask")}
    return holoscene_loss(out, gt, lcfg, step=0, call_reg=True)["loss"]
f3 = jax.jit(lambda p, k: jax.grad(lossfn)(p, k)["density"]["beta"])
bench("fwd+loss+grad", f3, params, key)
