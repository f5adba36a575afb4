#!/usr/bin/env python
"""Micro-profile of triplane fold variants (fwd+bwd) on the real chip.

The r4 train-step profile showed the triplane encode's fold arithmetic
(`jnp.repeat(w, F, 1) * rows` then a constant fold-matmul, plus the
layout copies XLA inserts around the (M, 256) intermediates) costing
~8 ms/step at M=262k — comparable to the scatter/gather cost it wraps.
This probe times three formulations of the same slot-fold so the
production encode can use the cheapest:

  A. repeat+matmul (current production form)
  B. reshape (M,S,F) + broadcast-multiply + sum over S
  C. einsum msf,ms->mf (XLA picks dot_general or mul-reduce)

and the matching backward update-row constructions.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, args, n=30, warmup=3):
    """Chained-dependency timing (see profile_chain.py: the axon relay's
    block_until_ready does not block for independent dispatches)."""
    x = args
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    M = 262144
    for S, F in ((16, 8), (64, 4)):
        rows = jnp.asarray(rng.standard_normal((M, S * F)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((M, S)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((M, F)).astype(np.float32))
        P = np.zeros((S * F, F), np.float32)
        for s in range(S):
            for f in range(F):
                P[s * F + f, f] = 1.0
        P = jnp.asarray(P)

        @jax.jit
        def fold_a(c):
            rows_, w_ = c
            prod = rows_ * jnp.repeat(w_, F, axis=1)
            out = jnp.dot(prod, P, preferred_element_type=jnp.float32)
            return rows_ + out.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def fold_b(c):
            rows_, w_ = c
            out = jnp.sum(rows_.reshape(M, S, F) * w_[:, :, None], axis=1)
            return rows_ + out.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def fold_c(c):
            rows_, w_ = c
            out = jnp.einsum("msf,ms->mf", rows_.reshape(M, S, F), w_)
            return rows_ + out.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def fold_d(c):
            # unrolled slot loop: F-wide slices, all fusible elementwise —
            # no (M,S,F) small-trailing-dim tensor is ever materialized
            rows_, w_ = c
            out = jnp.zeros((M, F), jnp.float32)
            for s in range(S):
                out = out + rows_[:, s * F:(s + 1) * F] * w_[:, s:s + 1]
            return rows_ + out.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def bwd_a(c):
            g_, w_ = c
            upd = jnp.repeat(w_, F, axis=1) * jnp.tile(g_, (1, S))
            return g_ + upd.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def bwd_b(c):
            g_, w_ = c
            upd = (w_[:, :, None] * g_[:, None, :]).reshape(M, S * F)
            return g_ + upd.sum(1, keepdims=True) * 1e-9, w_

        @jax.jit
        def bwd_d(c):
            # unrolled slot loop building the (M, S*F) update by concat
            g_, w_ = c
            upd = jnp.concatenate(
                [g_ * w_[:, s:s + 1] for s in range(S)], axis=1)
            return g_ + upd.sum(1, keepdims=True) * 1e-9, w_

        print(f"S={S} F={F}  (M={M})")
        print(f"  fwd repeat+matmul : {chain(fold_a, (rows, w)):7.3f} ms")
        print(f"  fwd mul+sum       : {chain(fold_b, (rows, w)):7.3f} ms")
        print(f"  fwd einsum        : {chain(fold_c, (rows, w)):7.3f} ms")
        print(f"  fwd slot-slices   : {chain(fold_d, (rows, w)):7.3f} ms")
        print(f"  bwd repeat*tile   : {chain(bwd_a, (g, w)):7.3f} ms")
        print(f"  bwd broadcast     : {chain(bwd_b, (g, w)):7.3f} ms")
        print(f"  bwd concat-slices : {chain(bwd_d, (g, w)):7.3f} ms")


if __name__ == "__main__":
    main()
