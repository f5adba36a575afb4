#!/usr/bin/env python
"""Probe 2: Mosaic's '2D gather' — lane-preserving take_along_axis from
a VMEM-resident table. If this lowers fast, both the hash-encode row
gather and the occupancy probe become Pallas kernels with ~zero HBM
gather traffic.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args_list, n=10, warmup=2):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    R, C = 8192, 128
    M = 262144
    table = jax.random.normal(ks[0], (R, C), jnp.float32)
    idxs = [jax.random.randint(k, (M,), 0, R, jnp.int32) for k in ks[:3]]

    TILE = 1024

    def kernel(tab_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (TILE, C))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)

    def pallas_rows(tab, ix):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, ix)

    try:
        fn = jax.jit(pallas_rows)
        out = fn(table, idxs[0])
        ok = bool(jnp.allclose(out, table[idxs[0]]))
        ms = timeit(fn, [(table, i) for i in idxs])
        print(f"Pallas take_along row gather ok={ok}  {ms:8.2f} ms")
    except Exception as e:
        print(f"Pallas take_along FAILED: {type(e).__name__}: {str(e)[:400]}")

    # XLA reference at same scale (vary idx): 262k x 128 rows
    xla = jax.jit(lambda t, i: t[i])
    print(f"XLA row gather same shape          "
          f"{timeit(xla, [(table, i) for i in idxs]):8.2f} ms")

    # 16-level version: grid (16, M//TILE), per-level table block resident
    L = 16
    tables = jax.random.normal(ks[1], (L, R, C), jnp.float32)
    lidxs = [jax.random.randint(k, (L, M), 0, R, jnp.int32) for k in ks[:3]]

    def kernel16(tab_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[0][:, None], (TILE, C))
        out_ref[0] = jnp.take_along_axis(tab_ref[0], idx2, axis=0)

    def pallas16(tab, ix):
        return pl.pallas_call(
            kernel16,
            out_shape=jax.ShapeDtypeStruct((L, M, C), jnp.float32),
            grid=(L, M // TILE),
            in_specs=[
                pl.BlockSpec((1, R, C), lambda l, i: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda l, i: (l, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda l, i: (l, i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, ix)

    try:
        fn16 = jax.jit(pallas16)
        out = fn16(tables, lidxs[0])
        ok = bool(jnp.allclose(out[3, :100], tables[3][lidxs[0][3, :100]]))
        ms = timeit(fn16, [(tables, i) for i in lidxs])
        print(f"Pallas 16-level row gather ok={ok}  {ms:8.2f} ms")
    except Exception as e:
        print(f"Pallas 16-level FAILED: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
