"""Structural scatter probes: row width, packing, scaling, pallas."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def timed_chain(make, v0, n=10):
    f = jax.jit(make)
    v = f(v0); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = f(v)
    jax.block_until_ready(v)
    return (time.perf_counter() - t0) / n * 1e3

# (a) element-count scaling, 1-D f32 scatter into 2^19
for M in (65536, 262144, 2097152):
    idx = jnp.asarray(rng.integers(0, 1 << 19, M, dtype=np.int32))
    v0 = jnp.asarray(rng.standard_normal(M, dtype=np.float32))
    def mk(vals, idx=idx):
        out = jnp.zeros((1 << 19,), jnp.float32).at[idx].add(vals)
        return vals * 1.0000001 + 1e-20 * out[0]
    print(f"1-D scatter {M:>8} el -> 2^19: {timed_chain(mk, v0):8.2f} ms", flush=True)

# table-size effect
for R in (4096, 65536, 1 << 19, 1 << 22):
    M = 2097152
    idx = jnp.asarray(rng.integers(0, R, M, dtype=np.int32))
    v0 = jnp.asarray(rng.standard_normal(M, dtype=np.float32))
    def mk(vals, idx=idx, R=R):
        out = jnp.zeros((R,), jnp.float32).at[idx].add(vals)
        return vals * 1.0000001 + 1e-20 * out[0]
    print(f"1-D scatter 2.1M el -> {R:>8}: {timed_chain(mk, v0):8.2f} ms", flush=True)

# (b) complex64 packing: 2 features per element
M = 2097152
idx = jnp.asarray(rng.integers(0, 1 << 19, M, dtype=np.int32))
vr = jnp.asarray(rng.standard_normal(M, dtype=np.float32))
def mk_cplx(vals, idx=idx):
    c = jax.lax.complex(vals, vals * 0.5)
    out = jnp.zeros((1 << 19,), jnp.complex64).at[idx].add(c)
    return vals * 1.0000001 + 1e-20 * jnp.real(out[0])
print(f"complex64 scatter 2.1M -> 2^19: {timed_chain(mk_cplx, vr):8.2f} ms", flush=True)

# (c) row scatters: rows of width W into (R_rows, W)
for W, Rr, M in ((2, 1 << 19, 2097152), (8, 1 << 19, 262144),
                 (128, 8192, 262144), (128, 8192, 65536)):
    idx = jnp.asarray(rng.integers(0, Rr, M, dtype=np.int32))
    v0 = jnp.asarray(rng.standard_normal((M, W), dtype=np.float32))
    def mk(vals, idx=idx, Rr=Rr, W=W):
        out = jnp.zeros((Rr, W), jnp.float32).at[idx].add(vals)
        return vals * 1.0000001 + 1e-20 * out[0, 0]
    print(f"row scatter {M:>8} x W={W:<4}-> ({Rr},{W}): {timed_chain(mk, v0):8.2f} ms", flush=True)

# (e) row gathers for comparison
for W, Rr, M in ((128, 8192, 262144), (2, 1 << 19, 2097152)):
    idx = jnp.asarray(rng.integers(0, Rr, M, dtype=np.int32))
    tab = jnp.asarray(rng.standard_normal((Rr, W), dtype=np.float32))
    def mk(t, idx=idx):
        out = t[idx]
        return t * 1.0000001 + 1e-20 * out[0, 0]
    print(f"row gather  {M:>8} x W={W:<4}from ({Rr},{W}): {timed_chain(mk, tab):8.2f} ms", flush=True)
