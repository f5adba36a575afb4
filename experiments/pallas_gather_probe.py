#!/usr/bin/env python
"""Empirical probe: can Mosaic lower dynamic gathers from VMEM, and how
fast are they vs XLA's HBM gathers? Informs the march/hash kernel design.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    R, C = 8192, 128          # hash level table
    M = 262144                # samples
    table = jax.random.normal(key, (R, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, R, jnp.int32)

    # baseline: XLA HBM gather
    xla_fn = jax.jit(lambda t, i: t[i])
    print(f"XLA row gather (262k x 128)   {timeit(xla_fn, table, idx):8.2f} ms")

    # Pallas: table resident in VMEM, jnp.take inside kernel
    TILE = 2048

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def pallas_gather(tab, ix):
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
        fn = jax.jit(pallas_gather)
        out = fn(table, idx)
        ok = jnp.allclose(out, table[idx])
        print(f"Pallas VMEM row gather ok={bool(ok)}  "
              f"{timeit(fn, table, idx):8.2f} ms")
    except Exception as e:
        print(f"Pallas row gather FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # bitfield probe: 2M cells as uint32 words in VMEM
    G3 = 128 ** 3
    words = jax.random.randint(jax.random.PRNGKey(2), (G3 // 32,),
                               0, 2 ** 31 - 1, jnp.int32)
    cell = jax.random.randint(jax.random.PRNGKey(3), (8192, 1024), 0, G3,
                              jnp.int32)

    xla_bit = jax.jit(lambda w, c: (w[c >> 5] >> (c & 31)) & 1)
    print(f"XLA bit probe (8.4M)          {timeit(xla_bit, words, cell):8.2f} ms")

    RT = 512   # rays per tile

    def bit_kernel(w_ref, c_ref, o_ref):
        c = c_ref[:]
        w = jnp.take(w_ref[:], (c >> 5).reshape(-1), axis=0).reshape(c.shape)
        o_ref[:] = (w >> (c & 31)) & 1

    def pallas_bit(w, c):
        return pl.pallas_call(
            bit_kernel,
            out_shape=jax.ShapeDtypeStruct(c.shape, jnp.int32),
            grid=(c.shape[0] // RT,),
            in_specs=[
                pl.BlockSpec((G3 // 32,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, 1024), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RT, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(w, c)

    try:
        fn = jax.jit(pallas_bit)
        out = fn(words, cell)
        ref = xla_bit(words, cell)
        ok = jnp.array_equal(out, ref)
        print(f"Pallas VMEM bit probe ok={bool(ok)}  "
              f"{timeit(fn, words, cell):8.2f} ms")
    except Exception as e:
        print(f"Pallas bit probe FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
