"""Multi-chip correctness: hermetic dryrun + dp-vs-single-device equivalence.

Round-1 failed the driver's `dryrun_multichip` because an un-pinned
`jax.random.PRNGKey` committed to the default (broken-TPU) backend before the
CPU mesh was built (MULTICHIP_r01.json: libtpu version mismatch from inside
`jax.device_put`). These tests guard both properties:

  * hermeticity — `dryrun_multichip` run in a fresh process WITHOUT any
    external platform pinning must never initialize a non-CPU backend;
  * numerics — a dp-sharded training step must match the single-device step
    on the same batch (loss and updated params) to float32 tolerance.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_is_hermetic():
    """Run the driver entry point in a subprocess with no JAX_PLATFORMS
    pinning (the driver environment) and assert only CPU backends were
    initialized — i.e. a broken accelerator runtime could not be touched."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"]
    )
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge\n"
        "plats = sorted(xla_bridge._backends.keys())\n"
        "assert plats and all(p == 'cpu' for p in plats), (\n"
        "    f'non-CPU backend initialized: {plats}')\n"
        "print('HERMETIC', plats)\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "dryrun_multichip OK" in res.stdout, res.stdout
    assert "HERMETIC ['cpu']" in res.stdout, res.stdout


def test_dp_step_matches_single_device():
    """Same batch through the single-device step and the 8-way dp-sharded
    step -> same loss/psnr, and the LOSS GRADIENTS match to fp32 tolerance
    (VERDICT.md next-round item #1).

    Gradients, not post-Adam params: dp sharding changes the scatter-add
    summation order of the hash-table gradients by a few ULPs, and
    Adam(eps=1e-15) amplifies ULP-level differences on near-zero grads into
    sign-level update differences — an optimizer property, not an SPMD
    correctness issue."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    lcfg = LossConfig()
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 1000)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, lcfg, optimizer)

    n_rays = 64
    rng = np.random.default_rng(0)
    batch_np = {
        "uv": rng.uniform(0, 32, (n_rays, 2)).astype(np.float32),
        "pose": np.eye(4, dtype=np.float32),
        "intrinsics": np.array(
            [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], dtype=np.float32
        ),
        "rgb": rng.uniform(0, 1, (n_rays, 3)).astype(np.float32),
        "depth": np.ones((n_rays, 1), np.float32),
        "normal": np.tile(np.array([[0, 0, -1]], np.float32), (n_rays, 1)),
        "segs": np.zeros((n_rays,), np.int32),
        "mask": np.ones((n_rays, 1), np.float32),
    }
    key = jax.random.PRNGKey(7)

    # single device (donation copies params first so we can reuse them)
    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = jax.tree_util.tree_map(jnp.array, opt_state)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p1, o1, m1 = step(p1, o1, key, batch1, 0, call_reg=True, with_bg=False)
    m1 = jax.tree_util.tree_map(np.asarray, m1)

    # 8-way dp mesh
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(8, 1), ("data", "model"))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    p2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    o2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        opt_state,
    )
    batch2 = {
        k: jax.device_put(
            v, dp if np.asarray(v).ndim and np.asarray(v).shape[0] == n_rays
            else rep
        )
        for k, v in batch_np.items()
    }
    p2, o2, m2 = step(
        p2, o2, jax.device_put(key, rep), batch2, 0,
        call_reg=True, with_bg=False,
    )
    m2 = jax.tree_util.tree_map(np.asarray, m2)

    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(m1["psnr"], m2["psnr"], rtol=2e-5, atol=2e-6)

    # gradient equivalence: the same loss differentiated on one device vs
    # the dp mesh
    from holoscene_tpu.losses.holoscene_loss import holoscene_loss
    from holoscene_tpu.models.holoscene import render_rays
    from holoscene_tpu.training.stage1 import rays_from_batch

    def loss_fn(p, batch):
        k1, k2 = jax.random.split(key)
        rays_o, rays_d, dscale, w2c = rays_from_batch(
            batch["uv"], batch["pose"], batch["intrinsics"], k1
        )
        out = render_rays(p, cfg, k2, rays_o, rays_d, dscale, w2c,
                          training=True)
        gt = {k: batch[k] for k in ("rgb", "depth", "normal", "segs",
                                    "mask")}
        return holoscene_loss(out, gt, lcfg, step=0, call_reg=True)["loss"]

    fresh = init_holoscene(jax.random.PRNGKey(0), cfg)
    grad_fn = jax.jit(jax.grad(loss_fn))
    g1 = jax.tree_util.tree_map(np.asarray, grad_fn(fresh, batch1))
    gp = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), fresh)
    g2 = jax.tree_util.tree_map(np.asarray, grad_fn(gp, batch2))
    for (path1, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        s = max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(
            a, b, atol=5e-5 * s, err_msg=str(path1)
        )


def test_dp_step_matches_single_device_tiered():
    """dp-vs-single equivalence with the tiered fine-level render path ON
    (render_fine_top_f): the per-ray weight ordering, two-tier encode and
    depth-order restore must be sharding-transparent — same batch -> same
    loss on the 8-way mesh as on one device."""
    import dataclasses

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    cfg = dataclasses.replace(
        cfg, forward_grad_mode="fused", render_top_m=8, render_fine_top_f=4,
        render_fine_levels=max(1, cfg.implicit.num_levels - 2),
    )
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 1000)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, LossConfig(), optimizer)

    n_rays = 64
    rng = np.random.default_rng(3)
    batch_np = {
        "uv": rng.uniform(0, 32, (n_rays, 2)).astype(np.float32),
        "pose": np.eye(4, dtype=np.float32),
        "intrinsics": np.array(
            [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], dtype=np.float32
        ),
        "rgb": rng.uniform(0, 1, (n_rays, 3)).astype(np.float32),
        "depth": np.ones((n_rays, 1), np.float32),
        "normal": np.tile(np.array([[0, 0, -1]], np.float32), (n_rays, 1)),
        "segs": np.zeros((n_rays,), np.int32),
        "mask": np.ones((n_rays, 1), np.float32),
    }
    key = jax.random.PRNGKey(9)

    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = jax.tree_util.tree_map(jnp.array, opt_state)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, _, m1 = step(p1, o1, key, batch1, 0, call_reg=True, with_bg=False)
    m1 = jax.tree_util.tree_map(np.asarray, m1)

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(8, 1), ("data", "model"))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    p2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    o2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        opt_state,
    )
    batch2 = {
        k: jax.device_put(
            v, dp if np.asarray(v).ndim and np.asarray(v).shape[0] == n_rays
            else rep
        )
        for k, v in batch_np.items()
    }
    _, _, m2 = step(
        p2, o2, jax.device_put(key, rep), batch2, 0,
        call_reg=True, with_bg=False,
    )
    m2 = jax.tree_util.tree_map(np.asarray, m2)

    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(m1["psnr"], m2["psnr"], rtol=2e-5, atol=2e-6)


def test_dp_weak_scaling_walltime_smoke():
    """Weak-scaling SANITY row (VERDICT r3 #4): the 8-way dp step at 8x the
    per-chip batch must complete and its walltime must stay within a loose
    superlinearity bound of 8x the single-device 1x-batch step. Virtual CPU
    devices share one host, so NO speedup is expected — this guards against
    the sharded step degenerating (e.g. a replicated all-pairs blowup),
    not for performance (the hardware dp evidence is probe_dp_batch.py's
    measured 4096-ray row: 93% efficiency at dp-4)."""
    import time

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 1000)
    step = make_train_step(cfg, LossConfig(), optimizer)

    def make_batch(n_rays, seed):
        rng = np.random.default_rng(seed)
        return {
            "uv": rng.uniform(0, 32, (n_rays, 2)).astype(np.float32),
            "pose": np.eye(4, dtype=np.float32),
            "intrinsics": np.array(
                [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], dtype=np.float32
            ),
            "rgb": rng.uniform(0, 1, (n_rays, 3)).astype(np.float32),
            "depth": np.ones((n_rays, 1), np.float32),
            "normal": np.tile(np.array([[0, 0, -1]], np.float32),
                              (n_rays, 1)),
            "segs": np.zeros((n_rays,), np.int32),
            "mask": np.ones((n_rays, 1), np.float32),
        }

    key = jax.random.PRNGKey(13)
    per_chip = 32

    def timed(p, o, batch, k):
        # compile + settle
        p, o, m = step(p, o, k, batch, 0, call_reg=True, with_bg=False)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        p, o, m = step(p, o, k, batch, 1, call_reg=True, with_bg=False)
        _ = float(m["loss"])
        return time.perf_counter() - t0

    opt_state = optimizer.init(params)
    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = jax.tree_util.tree_map(jnp.array, opt_state)
    b1 = {k: jnp.asarray(v) for k, v in make_batch(per_chip, 0).items()}
    t1 = timed(p1, o1, b1, key)

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(8, 1), ("data", "model"))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    n8 = per_chip * 8
    batch_np = make_batch(n8, 1)
    p2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    o2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        optimizer.init(params),
    )
    b2 = {
        k: jax.device_put(
            v, dp if np.asarray(v).ndim and np.asarray(v).shape[0] == n8
            else rep
        )
        for k, v in batch_np.items()
    }
    t8 = timed(p2, o2, b2, jax.device_put(key, rep))

    print(f"weak-scaling walltime: 1dev x{per_chip} rays {t1*1e3:.1f} ms, "
          f"8dev x{n8} rays {t8*1e3:.1f} ms (virtual CPU mesh, one host)")
    # virtual devices serialize on the host: expect ~8x, fail only on a
    # degenerate blowup (16x leaves 2x headroom over pure serialization)
    assert t8 < 16.0 * max(t1, 1e-3), (t1, t8)


def test_tp_sharded_params_match_single_device():
    """Tensor-parallel claim of parallel/mesh.py: hash-table rows sharded
    over the `model` axis (4 data x 2 model mesh via make_mesh/shard_params)
    must reproduce the single-device training-step loss — GSPMD turns the
    row gathers into collective gathers without changing the math."""
    import __graft_entry__ as entrymod
    from holoscene_tpu.losses.holoscene_loss import LossConfig
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        param_sharding,
        replicated,
        shard_params,
    )
    from holoscene_tpu.training.stage1 import make_optimizer, make_train_step

    cfg = entrymod._flagship_cfg(tiny=True)
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(5e-4, 20.0, 1000)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, LossConfig(), optimizer)

    n_rays = 64
    rng = np.random.default_rng(5)
    batch_np = {
        "uv": rng.uniform(0, 32, (n_rays, 2)).astype(np.float32),
        "pose": np.eye(4, dtype=np.float32),
        "intrinsics": np.array(
            [[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]], dtype=np.float32
        ),
        "rgb": rng.uniform(0, 1, (n_rays, 3)).astype(np.float32),
        "depth": np.ones((n_rays, 1), np.float32),
        "normal": np.tile(np.array([[0, 0, -1]], np.float32), (n_rays, 1)),
        "segs": np.zeros((n_rays,), np.int32),
        "mask": np.ones((n_rays, 1), np.float32),
    }
    key = jax.random.PRNGKey(11)

    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = jax.tree_util.tree_map(jnp.array, opt_state)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, _, m1 = step(p1, o1, key, batch1, 0, call_reg=True, with_bg=False)
    m1 = jax.tree_util.tree_map(np.asarray, m1)

    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # the tiny config's hash tables must actually shard (not fall back to
    # replication) for this test to exercise TP
    specs = param_sharding(mesh, params)
    grid_spec = specs["implicit"]["grid"].spec
    assert grid_spec == jax.sharding.PartitionSpec("model", None), grid_spec

    p2 = shard_params(mesh, params)
    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    o2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        opt_state,
    )
    batch2 = {
        k: jax.device_put(
            v, dp if np.asarray(v).ndim and np.asarray(v).shape[0] == n_rays
            else rep
        )
        for k, v in batch_np.items()
    }
    _, _, m2 = step(
        p2, o2, jax.device_put(key, rep), batch2, 0,
        call_reg=True, with_bg=False,
    )
    m2 = jax.tree_util.tree_map(np.asarray, m2)

    assert np.isfinite(m2["loss"])
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(m1["psnr"], m2["psnr"], rtol=2e-5, atol=2e-6)
