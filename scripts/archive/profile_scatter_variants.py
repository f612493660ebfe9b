"""Backward-scatter variants at flagship shapes — pick the fastest layout
for the fused VJP's parameter gradient (the step's remaining wall,
PERF.md round 2: ~315 ms for ~18M scattered elements).

Variants (hashed-level share, n=57k render pts, 10 hashed levels):
  A  4x flat element scatter (shipped: per channel into [rows*2] flat)
  B  1x [M,4] row scatter into [rows,4]  (layout-trap risk: lane padding)
  C  1x interleaved element scatter [4M] -> flat [rows*4]
  D  sort+segment-sum then B's write pattern on unique rows
  E  one-hot MXU matmul for ONE coarse level (T=4096 / 27k):
     grad_T = onehot(idx)^T @ vals  — no scatter engine at all
  F  dense-prefix [M,32] row scatter (shipped bg path) for reference

Run serial on an idle chip (ONE TPU job at a time — PERF.md rule 1).

NOTE: every variant must RETURN the scattered array (not a sum of it):
XLA rewrites sum(zeros.at[i].add(v)) == sum(v) and deletes the scatter.
NOTE 2: jax.block_until_ready is a NO-OP under the axon relay — sync by
reading one element back to host (np.asarray), like every scripts/ probe.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_PTS = 57_000
L_H = 10            # hashed levels at the flagship config
ROWS_L = 1 << 19    # rows per hashed level
ROWS = L_H * ROWS_L
M = L_H * 8 * N_PTS  # per-channel contributions ~4.56M


def _sync(out):
    # Sync WITHOUT pulling the whole buffer over the relay: a separate
    # jitted reduce cannot be DCE'd (its input must materialize), and only
    # 4 bytes cross the wire.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def bench(name, f, *args, n=5):
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {ms:8.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    # duplicate-heavy-ish indices: per level, 8*n draws over its own range
    ks = jax.random.split(key, 4)
    per_level = jax.random.randint(
        ks[0], (L_H, 8 * N_PTS), 0, ROWS_L, dtype=jnp.int32
    )
    rh = (per_level + (jnp.arange(L_H, dtype=jnp.int32) * ROWS_L)[:, None]
          ).reshape(-1)                       # [M] global hashed rows
    vals = jax.random.normal(ks[1], (M, 4), jnp.float32)
    print(f"M={M} rows={ROWS}")

    # A: shipped — 4 per-channel element scatters into flat [ROWS*2]
    @jax.jit
    def variant_a(rh, vals):
        idx2 = rh * 2
        outs = []
        for t in range(2):
            g = (
                jnp.zeros((ROWS * 2,), jnp.float32)
                .at[jnp.concatenate([idx2, idx2 + 1])]
                .add(jnp.concatenate([vals[:, 2 * t], vals[:, 2 * t + 1]]))
            )
            outs.append(g)
        return outs

    # B: one [M,4] row scatter into [ROWS,4]
    @jax.jit
    def variant_b(rh, vals):
        g = jnp.zeros((ROWS, 4), jnp.float32).at[rh].add(vals)
        return g

    # C: one interleaved element scatter into flat [ROWS*4]
    @jax.jit
    def variant_c(rh, vals):
        idx = (rh[:, None] * 4
               + jnp.arange(4, dtype=jnp.int32)[None, :]).reshape(-1)
        g = (jnp.zeros((ROWS * 4,), jnp.float32)
             .at[idx].add(vals.reshape(-1)))
        return g

    # D: sort by row then segment-style fold via sorted scatter
    @jax.jit
    def variant_d(rh, vals):
        order = jnp.argsort(rh)
        rs = rh[order]
        vs = vals[order]
        g = jnp.zeros((ROWS, 4), jnp.float32).at[rs].add(vs)
        return g

    # G: 4 independent per-channel scatters (no concat arithmetic)
    @jax.jit
    def variant_g(rh, vals):
        outs = []
        for ch in range(4):
            outs.append(
                jnp.zeros((ROWS,), jnp.float32).at[rh].add(vals[:, ch])
            )
        return outs

    # H: bf16 values, same layout as A (is the engine byte-bound?)
    @jax.jit
    def variant_h(rh, vals):
        idx2 = rh * 2
        vb = vals.astype(jnp.bfloat16)
        outs = []
        for t in range(2):
            g = (
                jnp.zeros((ROWS * 2,), jnp.bfloat16)
                .at[jnp.concatenate([idx2, idx2 + 1])]
                .add(jnp.concatenate([vb[:, 2 * t], vb[:, 2 * t + 1]]))
            )
            outs.append(g)
        return outs

    # I: A's layout at half the table (does cost track table size?)
    @jax.jit
    def variant_i(rh, vals):
        rh2 = rh // 2
        idx2 = rh2 * 2
        outs = []
        for t in range(2):
            g = (
                jnp.zeros((ROWS,), jnp.float32)
                .at[jnp.concatenate([idx2, idx2 + 1])]
                .add(jnp.concatenate([vals[:, 2 * t], vals[:, 2 * t + 1]]))
            )
            outs.append(g)
        return outs

    bench("A  4x flat element scatter (shipped)", variant_a, rh, vals)
    bench("B  [M,4] row scatter -> [rows,4]", variant_b, rh, vals)
    bench("C  interleaved flat element scatter", variant_c, rh, vals)
    bench("D  sort + sorted row scatter", variant_d, rh, vals)
    bench("G  4 per-channel scatters, no concat", variant_g, rh, vals)
    bench("H  A-layout but bf16 values", variant_h, rh, vals)
    bench("I  A-layout, half-size table", variant_i, rh, vals)
    # J: A's exact computation on PRE-sorted indices (locality effect)
    order = np.argsort(np.asarray(rh), kind="stable")
    rh_sorted = jnp.asarray(np.asarray(rh)[order])
    vals_sorted = jnp.asarray(np.asarray(vals)[order])
    bench("J  A on pre-sorted indices", variant_a, rh_sorted, vals_sorted)

    # E: one-hot matmul for one coarse level, all 4 channels at once.
    for t_rows, res_name in ((4096, "16^3"), (27000, "30^3"), (74088, "42^3")):
        c = 8 * N_PTS
        idx_l = jax.random.randint(ks[2], (c,), 0, t_rows, dtype=jnp.int32)
        vals_l = jax.random.normal(ks[3], (c, 4), jnp.float32)

        @jax.jit
        def variant_e(idx_l, vals_l, t_rows=t_rows, c=c):
            blk = 8192
            pad = (-c) % blk
            idx_p = jnp.concatenate(
                [idx_l, jnp.full((pad,), t_rows, jnp.int32)]) if pad else idx_l
            vals_p = jnp.concatenate(
                [vals_l, jnp.zeros((pad, 4), jnp.float32)]) if pad else vals_l
            nb = (c + pad) // blk

            def body(acc, b):
                i = jax.lax.dynamic_slice_in_dim(idx_p, b * blk, blk)
                v = jax.lax.dynamic_slice_in_dim(vals_p, b * blk, blk)
                onehot = (
                    i[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, t_rows), 1)
                ).astype(jnp.bfloat16)
                v_hi = v.astype(jnp.bfloat16)
                v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                g = jax.lax.dot_general(
                    onehot, v_hi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    onehot, v_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + g, None

            acc0 = jnp.zeros((t_rows, 4), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(nb))
            return acc

        @jax.jit
        def variant_e_scatter(idx_l, vals_l, t_rows=t_rows):
            g = jnp.zeros((t_rows, 4), jnp.float32).at[idx_l].add(vals_l)
            return g

        bench(f"E  one-hot matmul, T={res_name}", variant_e, idx_l, vals_l)
        bench(f"E' row scatter same shapes, T={res_name}",
              variant_e_scatter, idx_l, vals_l)

    # F: dense-prefix style [M,32] row scatter (bg path reference)
    m_dense = 6 * N_PTS
    total_cells = 770_000
    cell = jax.random.randint(ks[2], (m_dense,), 0, total_cells, jnp.int32)
    upd = jax.random.normal(ks[3], (m_dense, 32), jnp.float32)

    @jax.jit
    def variant_f(cell, upd):
        g = jnp.zeros((total_cells, 32), jnp.float32).at[cell].add(upd)
        return g

    bench("F  [M,32] row scatter (bg dense path)", variant_f, cell, upd)


if __name__ == "__main__":
    main()
