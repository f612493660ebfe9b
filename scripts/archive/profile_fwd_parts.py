"""Decompose the fused forward's 116 ms (profile_phases6 line 1) into
gather / index+weight compute / per-step table-build shares, to pick the
round-2 tail lever.

Probes (scan-amortized k=9 vs k=1; sync via host readback — PERF.md
pitfall #5; run ALONE on an idle chip — rule #1):
  A. quad row gather alone (indices perturbed, build hoisted)
  B. _fused_core (x perturbed, build hoisted) = idx + gather + unpack
  C. _fused_weights alone (x perturbed)
  D. build cost: same encode with emb in the scan carry (pack/interleave
     re-runs per iter) minus emb closed over (build hoisted)
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import holoscene_tpu  # noqa: E402

holoscene_tpu.setup_compile_cache()

from bench import flagship_config  # noqa: E402
from holoscene_tpu.models.holoscene import init_holoscene  # noqa: E402
from holoscene_tpu.ops.hashgrid import (  # noqa: E402
    _corner_indices,
    _fused_core,
    _fused_level_split,
    _fused_weights,
    _interleave_last,
    _pack_pairs,
)

cfg = flagship_config()
params = init_holoscene(jax.random.PRNGKey(0), cfg)
meta = cfg.implicit.grid_meta
NPTS = 1024 * (cfg.render_top_m or 98)
K = 9


def timed(fn, *args):
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def phase(name, body, x0):
    def make(k):
        @jax.jit
        def run(x0):
            def step(x, _):
                out = body(x)
                leaves = jax.tree_util.tree_leaves(out)
                delta = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return x + delta * 1e-20, None

            x, _ = jax.lax.scan(step, x0, None, length=k)
            return x

        return run

    tk, c1 = timed(make(K), x0)
    t1, c2 = timed(make(1), x0)
    ms = (tk - t1) / (K - 1) * 1000
    print(f"{name:58s} {ms:8.1f} ms  (compile {c1 + c2:.0f}s)", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ea = params["implicit"]["grid"]
    eb = params["implicit"]["color_grid"]
    rows = meta.table_rows
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (NPTS, 3), minval=0.05, maxval=0.95)
    L = meta.num_levels

    # A. pure quad gather, idx perturbed (int carry), build hoisted
    quad0 = _interleave_last([_pack_pairs(ea), _pack_pairs(eb)])
    row0 = jax.random.randint(key, (L, 8, NPTS), 0, rows)

    def body_a(r):
        g = jnp.take(quad0, r, axis=0)
        # fold int dependency: shift rows by a value-derived int
        d = (jnp.sum(g[..., 0]).astype(jnp.int32) & 0) + 1
        return (r + d) % rows

    phase(f"A quad row gather [{L},8,{NPTS}]", body_a, row0)

    # B. _fused_core full (x perturbed)
    phase("B _fused_core (idx+gather+unpack)", lambda x: _fused_core(
        x, ea, eb, meta, "packed")[3], x0)

    # C. index + weights only (no gather)
    corners_b = jnp.asarray(_corner_indices(meta).astype(bool))
    scales_j = jnp.asarray(_fused_level_split(meta)[3])[:, None, None]

    def body_c(x):
        idx, frac, oob, _ = _fused_core(x, ea[:8], eb[:8],
                                        meta, "raw")  # tiny-table gathers
        ws, cw, dcw, dws, dds = _fused_weights(frac, scales_j, corners_b)
        return cw, dcw[0]

    phase("C idx+weights (tiny-table gathers)", body_c, x0)

    # D. build cost: emb in carry vs closed over
    def body_d_carry(carry):
        ea_c, eb_c, x = carry
        _, _, _, vals = _fused_core(x, ea_c, eb_c, meta, "packed")
        s = sum(jnp.sum(v) for v in vals)
        return (ea_c + s * 1e-30, eb_c + s * 1e-30, x + s * 1e-30)

    def body_d_fixed(x):
        return _fused_core(x, ea, eb, meta, "packed")[3]

    m_carry = phase("D1 core, emb in carry (build per iter)", body_d_carry,
                    (ea, eb, x0))
    m_fixed = phase("D2 core, emb closed over (build hoisted)", body_d_fixed,
                    x0)
    print(f"{'=> per-step build cost':58s} {m_carry - m_fixed:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
