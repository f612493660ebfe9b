"""Time stage-4 style render+grad steps: JAX compositor vs fused Pallas
fwd+bwd kernels, on realistic shapes (512x512, 100k gaussians, K=512).

Run on the real TPU (no JAX_PLATFORMS override). Forces readback so the
axon relay's no-op block_until_ready cannot fake timings.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.splat import render_gaussians


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n = args.n
    params = {
        "means": jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)),
        "scales": jnp.asarray(
            np.log(rng.uniform(0.005, 0.02, (n, 3))).astype(np.float32)
        ),
        "opac": jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32)),
        "colors": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    }
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(2.0)
    r = args.res
    intr = jnp.array([[r * 0.9, 0, r / 2], [0, r * 0.9, r / 2], [0, 0, 1.0]])
    tgt = jnp.asarray(rng.uniform(0, 1, (r, r, 3)).astype(np.float32))

    def loss(p, use_pallas):
        out = render_gaussians(
            p["means"], quats, jnp.exp(p["scales"]),
            jax.nn.sigmoid(p["opac"]), p["colors"], viewmat, intr,
            width=r, height=r, tile_size=16, max_per_tile=args.k,
            use_pallas=use_pallas,
        )
        return jnp.mean((out["rgb"] - tgt) ** 2)

    for use_pallas in (False, True):
        if args.fwd_only:
            fn = jax.jit(lambda p: loss(p, use_pallas))
        else:
            fn = jax.jit(lambda p: jax.grad(loss)(p, use_pallas)["means"])
        t0 = time.perf_counter()
        out = fn(params)
        _ = float(jnp.asarray(out).ravel()[0])  # force real readback
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params)
        _ = float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        mode = "fwd" if args.fwd_only else "fwd+bwd"
        print(
            f"use_pallas={use_pallas} {mode}: {dt*1000:.2f} ms/step "
            f"({n/dt/1e6:.2f} M splats/s, compile {compile_s:.1f}s)"
        )


if __name__ == "__main__":
    main()
