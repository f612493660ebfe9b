import time, sys, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import flagship_config, make_batch
from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss
from holoscene_tpu.models.holoscene import init_holoscene, render_rays
from holoscene_tpu.training.stage1 import rays_from_batch

cfg = flagship_config()
key = jax.random.PRNGKey(0)
params = init_holoscene(key, cfg)
batch = make_batch(key, 1024)
o, d, ds, w2c = jax.jit(lambda b: rays_from_batch(b["uv"], b["pose"], b["intrinsics"]))(batch)

def bench(name, f, *args, n=3):
    t0 = time.perf_counter()
    out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.0f} ms", flush=True)

def make_lossfn(lcfg, drop_normals):
    def lossfn(p, k):
        out = render_rays(p, cfg, k, o, d, ds, w2c, training=True)
        if drop_normals:
            out = dict(out)
            out["normal_map"] = jax.lax.stop_gradient(out["normal_map"])
        gt = {kk: batch[kk] for kk in ("rgb","depth","normal","segs","mask")}
        return holoscene_loss(out, gt, lcfg, step=0, call_reg=True)["loss"]
    return lossfn

lcfg = LossConfig(depth_weight=0.5, semantic_weight=5.0)
for name, drop in [("full grad (with 2nd-order normals)", False),
                   ("grad w/o normal-map gradient", True)]:
    lf = make_lossfn(lcfg, drop)
    f = jax.jit(lambda p, k, lf=lf: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(jax.grad(lf)(p, k))))
    bench(name, f, params, key)
