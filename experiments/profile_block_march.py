#!/usr/bin/env python
"""Prototype benchmark for the block-halo march design.

Plan: one (512B) halo-row gather per 16-step block (524k gathers instead
of 8.4M scalar probes), then extract the 16 per-step occupancy values
from the gathered row with fused one-hot arithmetic (no further
gathers). This times each candidate extraction formulation.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N, S = 8192, 1024
BLK = 16
NB = N * (S // BLK)        # 524288 blocks
HALO = 512                 # 8^3 cells per anchored halo row
A3 = 32 ** 3               # anchor grid (G/4)^3


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
    table = jax.random.randint(ks[0], (A3, HALO), 0, 2, jnp.uint8)
    anchors = [jax.random.randint(k, (NB,), 0, A3, jnp.int32)
               for k in ks[:3]]
    # per-block per-step local flat indices in [0, 512)
    locs = [jax.random.randint(k, (NB, BLK), 0, HALO, jnp.int32)
            for k in ks[3:6]]

    # 1) halo row gather alone
    g = jax.jit(lambda a: table[a])
    print(f"halo row gather (524k x 512B)  "
          f"{timeit(g, [(a,) for a in anchors]):8.2f} ms")

    # 2) gather + compare-reduce extraction (full 512 one-hot, fused?)
    def extract_full(a, loc):
        rows = table[a]                              # (NB, 512)
        iota = jnp.arange(HALO, dtype=jnp.int32)
        oh = (loc[:, :, None] == iota).astype(jnp.float32)   # (NB,16,512)
        return jnp.einsum("bkj,bj->bk", oh, rows.astype(jnp.float32))
    print(f"gather+onehot512 einsum        "
          f"{timeit(jax.jit(extract_full), list(zip(anchors, locs))):8.2f} ms")

    def extract_full_sum(a, loc):
        rows = table[a]
        iota = jnp.arange(HALO, dtype=jnp.int32)
        eq = loc[:, :, None] == iota                  # (NB,16,512) bool
        vals = jnp.where(eq, rows[:, None, :], 0)
        return jnp.sum(vals, axis=-1)
    print(f"gather+where+sum               "
          f"{timeit(jax.jit(extract_full_sum), list(zip(anchors, locs))):8.2f} ms")

    # 3) factored z-then-yx extraction
    def extract_factored(a, loc):
        rows = table[a].astype(jnp.float32)          # (NB, 512) z-major
        lz, rem = loc >> 6, loc & 63                 # (NB,16)
        ohz = (lz[:, :, None] == jnp.arange(8)).astype(jnp.float32)
        halo3 = rows.reshape(NB, 8, 64)
        sel = jnp.einsum("bkz,bzj->bkj", ohz, halo3)  # (NB,16,64)
        ohyx = (rem[:, :, None] == jnp.arange(64)).astype(jnp.float32)
        return jnp.sum(sel * ohyx, axis=-1)
    print(f"gather+factored z/yx           "
          f"{timeit(jax.jit(extract_factored), list(zip(anchors, locs))):8.2f} ms")

    # 4) bf16 variant of the full one-hot
    def extract_bf16(a, loc):
        rows = table[a].astype(jnp.bfloat16)
        iota = jnp.arange(HALO, dtype=jnp.int32)
        oh = (loc[:, :, None] == iota).astype(jnp.bfloat16)
        return jnp.einsum("bkj,bj->bk", oh, rows,
                          preferred_element_type=jnp.float32)
    print(f"gather+onehot512 bf16          "
          f"{timeit(jax.jit(extract_bf16), list(zip(anchors, locs))):8.2f} ms")

    # 5) sanity: correctness of factored vs direct indexing on small set
    a0, l0 = anchors[0][:1024], locs[0][:1024]
    rows = table[a0]
    want = jnp.take_along_axis(rows, l0, axis=1)

    def extract_factored_small(a, loc, nb):
        rows = table[a].astype(jnp.float32)
        lz, rem = loc >> 6, loc & 63
        ohz = (lz[:, :, None] == jnp.arange(8)).astype(jnp.float32)
        halo3 = rows.reshape(nb, 8, 64)
        sel = jnp.einsum("bkz,bzj->bkj", ohz, halo3)
        ohyx = (rem[:, :, None] == jnp.arange(64)).astype(jnp.float32)
        return jnp.sum(sel * ohyx, axis=-1)
    got = extract_factored_small(a0, l0, 1024)
    print("factored correct:", bool(jnp.all(got == want.astype(jnp.float32))))


if __name__ == "__main__":
    main()
