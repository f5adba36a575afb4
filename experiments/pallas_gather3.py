#!/usr/bin/env python
"""Pallas gather kernel shootout vs the 8 ns/index XLA gather plateau.

Chained-dependency timing (block_until_ready through the axon tunnel
does not actually block for independent dispatches). Every device
array is passed as an argument (closed-over device arrays degrade the
tunnel permanently).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, M = 8192, 128, 262144
TILE = 1024


def chain(fn, x0, n=20, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def make_chainable(gather_fn, table):
    """idx -> idx chained step through the gather under test."""
    @jax.jit
    def step(ix):
        rows = gather_fn(table, ix)                       # (M, C)
        s = jnp.sum(rows[:, :8], axis=1).astype(jnp.int32)
        return (ix + (s & 3) + 1) % R
    return step


# V0: XLA baseline
def xla_gather(tab, ix):
    return tab[ix]


# V1: fori_loop of scalar dynamic slices, idx tile in SMEM
def v1_kernel(idx_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tab_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, TILE, body, 0)


def v1_gather(tab, ix):
    return pl.pallas_call(
        v1_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(ix, tab)


# V2: Mosaic 2D gather via take_along_axis inside the kernel
def v2_kernel(idx_ref, tab_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:].reshape(TILE, 1), (TILE, C))
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)


def v2_gather(tab, ix):
    return pl.pallas_call(
        v2_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(ix, tab)


# V3: per-row async DMA from HBM-resident table, batched starts
def v3_kernel(idx_ref, tab_hbm, out_ref, sem):
    def start(i, _):
        pltpu.make_async_copy(
            tab_hbm.at[idx_ref[i]], out_ref.at[i], sem.at[i % 16]
        ).start()
        return 0
    jax.lax.fori_loop(0, TILE, start, 0)

    def wait(i, _):
        pltpu.make_async_copy(
            tab_hbm.at[idx_ref[i]], out_ref.at[i], sem.at[i % 16]
        ).wait()
        return 0
    jax.lax.fori_loop(0, TILE, wait, 0)


def v3_gather(tab, ix):
    return pl.pallas_call(
        v3_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ix, tab)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    ix0 = jnp.asarray(rng.integers(0, R, (M,)).astype(np.int32))
    ref = np.asarray(None) if False else None

    base = make_chainable(xla_gather, table)
    print(f"V0 XLA gather          {chain(base, ix0):8.2f} ms", flush=True)

    for name, fn in (("V1 fori SMEM-idx", v1_gather),
                     ("V2 take_along 2D", v2_gather),
                     ("V3 row DMA", v3_gather)):
        try:
            step = make_chainable(fn, table)
            # correctness vs XLA on a few entries (device-side compare
            # to avoid host fetches of big buffers)
            ok = bool(jax.jit(
                lambda t, i: jnp.allclose(fn(t, i)[:512], t[i][:512])
            )(table, ix0))
            ms = chain(step, ix0)
            print(f"{name:22s} ok={ok} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
