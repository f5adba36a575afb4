#!/usr/bin/env python
"""Microbench: backward table scatter-add strategies on the real chip.

The r5 profile (experiments/PROFILE_r05.md) shows the four triplane
backward scatter-adds at 8.5 ms/step (32%): XLA's native scatter costs
~12 ns per INDEX regardless of row width (the same cost law as
gathers). Candidate reformulations all try to shrink the number of
scattered indices to the number of UNIQUE rows touched (ray samples
are spatially coherent, so ~5-20x dedup is available):

  A. native .at[rows].add(updates)                      [baseline]
  B. sort rows -> permute SMALL per-sample factors -> outer product on
     the fly -> f32 cumsum along samples -> boundary diff -> scatter
     with unique indices
  C. segment_sum with sorted ids
  D. native scatter in bf16 updates (traffic halving probe)

Run: python experiments/probe_scatter.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def make_ray_coherent_rows(M, R, key, run=24):
    """Row ids with ray-like spatial coherence (runs of nearby rows)."""
    k1, k2 = jax.random.split(key)
    n_runs = M // run
    starts = jax.random.randint(k1, (n_runs,), 0, R)
    drift = jnp.cumsum(jax.random.randint(k2, (n_runs, run), 0, 3), axis=1)
    rows = (starts[:, None] + drift) % R
    return rows.reshape(-1).astype(jnp.int32)


def main():
    M = 262080
    cases = [("plane", 29241, 16, 8), ("grid3d", 10648, 64, 4)]
    key = jax.random.PRNGKey(0)
    for name, R, S, F in cases:
        W = S * F
        rows = make_ray_coherent_rows(M, R, key)
        w = jax.random.normal(key, (M, S), jnp.float32)
        g = jax.random.normal(key, (M, F), jnp.float32)
        table = jnp.zeros((R, W), jnp.float32)
        print(f"--- {name}: M={M} R={R} row_width={W} "
              f"unique={len(np.unique(np.asarray(rows)))}")

        # A: native scatter of precomputed update rows (current impl:
        # updates materialize inside the same fusion)
        @jax.jit
        def scatter_native(rows, w, g, table):
            upd = (g[:, :, None] * w[:, None, :]).reshape(M, W)
            return table.at[rows].add(upd)

        t = timeit(scatter_native, rows, w, g, table)
        print(f"A native scatter-add           {t:7.3f} ms")
        ref = scatter_native(rows, w, g, table)

        # B: sort + on-the-fly outer + cumsum + boundary-diff + unique
        @jax.jit
        def scatter_sorted_cumsum(rows, w, g, table):
            order = jnp.argsort(rows)
            rs = rows[order]
            ws = w[order]
            gs = g[order]
            upd = (gs[:, :, None] * ws[:, None, :]).reshape(M, W)
            c = jnp.cumsum(upd, axis=0)
            # last position of each run of equal row ids
            last = jnp.concatenate([rs[1:] != rs[:-1],
                                    jnp.ones((1,), bool)])
            # segment totals: diff of cumsum at run ends. Scatter the
            # runs' totals at their END positions' row ids; non-end
            # positions scatter zeros to a dump row.
            c_end = jnp.where(last[:, None], c, 0.0)
            prev = jnp.concatenate(
                [jnp.zeros((1, W)), jnp.where(last[:, None], c, 0.0)[:-1]])
            # prev run-end cumsum per position: forward-fill of c at
            # previous run end == cumulative of zeros... simpler: diff
            # via gather of previous end index
            end_idx = jnp.nonzero(last, size=M, fill_value=M - 1)[0]
            totals = c[end_idx] - jnp.concatenate(
                [jnp.zeros((1, W)), c[end_idx][:-1]])
            out_rows = rs[end_idx]
            return table.at[out_rows].add(totals, mode="drop",
                                          unique_indices=False)

        t = timeit(scatter_sorted_cumsum, rows, w, g, table)
        out = scatter_sorted_cumsum(rows, w, g, table)
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"B sort+cumsum+diff scatter     {t:7.3f} ms  rel_err {err:.2e}")

        # C: segment_sum sorted -> dense grad table, then add
        @jax.jit
        def scatter_segment_sorted(rows, w, g, table):
            order = jnp.argsort(rows)
            rs = rows[order]
            upd = (g[order][:, :, None] * w[order][:, None, :]).reshape(M, W)
            grad = jax.ops.segment_sum(upd, rs, num_segments=R,
                                       indices_are_sorted=True)
            return table + grad

        t = timeit(scatter_segment_sorted, rows, w, g, table)
        out = scatter_segment_sorted(rows, w, g, table)
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"C segment_sum(sorted)          {t:7.3f} ms  rel_err {err:.2e}")

        # C2: segment_sum unsorted
        @jax.jit
        def scatter_segment(rows, w, g, table):
            upd = (g[:, :, None] * w[:, None, :]).reshape(M, W)
            grad = jax.ops.segment_sum(upd, rows, num_segments=R)
            return table + grad

        t = timeit(scatter_segment, rows, w, g, table)
        print(f"C2 segment_sum(unsorted)       {t:7.3f} ms")

        # D: native scatter, bf16 updates
        @jax.jit
        def scatter_bf16(rows, w, g, table):
            upd = (g[:, :, None] * w[:, None, :]).reshape(M, W)
            return table.at[rows].add(upd.astype(jnp.bfloat16)
                                      .astype(jnp.float32))

        t = timeit(scatter_bf16, rows, w, g, table)
        print(f"D native scatter bf16 updates  {t:7.3f} ms")


if __name__ == "__main__":
    main()
