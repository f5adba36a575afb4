"""Chained scatter-add strategy probes (relay memoizes identical calls)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

M8 = 2097152   # 262144 samples x 8 corners
R = 1 << 19

rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, R, M8, dtype=np.int32))
vals0 = jnp.asarray(rng.standard_normal(M8, dtype=np.float32))


def timed_chain(fn, v0, n=10):
    v = fn(v0); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = fn(v)
    jax.block_until_ready(v)
    return (time.perf_counter() - t0) / n * 1e3


def chainify(scatter_fn):
    @jax.jit
    def f(vals):
        out = scatter_fn(idx0, vals)
        return vals * 1.0000001 + 1e-20 * out[0]
    return f


def direct(idx, vals):
    return jnp.zeros((R,), jnp.float32).at[idx].add(vals)

def seg(idx, vals):
    return jax.ops.segment_sum(vals, idx, num_segments=R)

def bf16(idx, vals):
    return jnp.zeros((R,), jnp.bfloat16).at[idx].add(vals.astype(jnp.bfloat16))

def sortseg(idx, vals):
    si, sv = jax.lax.sort((idx, vals), num_keys=1)
    return jax.ops.segment_sum(sv, si, num_segments=R, indices_are_sorted=True)

print(f"direct 2.1M->2^19      : {timed_chain(chainify(direct), vals0):8.2f} ms", flush=True)
print(f"segment_sum            : {timed_chain(chainify(seg), vals0):8.2f} ms", flush=True)
print(f"bf16 direct            : {timed_chain(chainify(bf16), vals0):8.2f} ms", flush=True)
print(f"sort+segsum(sorted)    : {timed_chain(chainify(sortseg), vals0):8.2f} ms", flush=True)

# 2-column rows (M,8->M8) like the real bwd: with transpose+reshape
M = 262144
g0 = jnp.asarray(rng.standard_normal((M, 8), dtype=np.float32))
idx2 = jnp.asarray(rng.integers(0, R, (M, 8), dtype=np.int32))

@jax.jit
def with_transpose(g):
    vals = g.T.reshape(-1)
    rows = idx2.T.reshape(-1)
    out = jnp.zeros((R,), jnp.float32).at[rows].add(vals)
    return g * 1.0000001 + 1e-20 * out[0]

print(f"transpose+direct       : {timed_chain(with_transpose, g0):8.2f} ms", flush=True)

@jax.jit
def no_transpose(g):
    vals = g.reshape(-1)
    rows = idx2.reshape(-1)
    out = jnp.zeros((R,), jnp.float32).at[rows].add(vals)
    return g * 1.0000001 + 1e-20 * out[0]

print(f"row-major direct       : {timed_chain(no_transpose, g0):8.2f} ms", flush=True)

# scatter with 'drop' vs default mode
@jax.jit
def drop_mode(g):
    vals = g.reshape(-1)
    rows = idx2.reshape(-1)
    out = jnp.zeros((R,), jnp.float32).at[rows].add(vals, mode="drop")
    return g * 1.0000001 + 1e-20 * out[0]

print(f"row-major drop-mode    : {timed_chain(drop_mode, g0):8.2f} ms", flush=True)

# full 16-level 2-feature workload as in hash bwd: 32 scatters from one g
g32 = jnp.asarray(rng.standard_normal((M, 32), dtype=np.float32))
wts0 = jnp.asarray(rng.random((M, 8), dtype=np.float32))
idx16 = jnp.asarray(rng.integers(0, R, (16, M, 8), dtype=np.int32))

@jax.jit
def full_bwd_like(g):
    cols = [jnp.zeros((R,), jnp.float32) for _ in range(2)]
    for l in range(16):
        rows_cm = idx16[l].T.reshape(-1)
        gl = g[:, 2*l:2*l+2]
        for f in range(2):
            vals = (wts0 * gl[:, f:f+1]).T.reshape(-1)
            cols[f] = cols[f].at[rows_cm].add(vals)
    return g * 1.0000001 + 1e-20 * (cols[0][0] + cols[1][0])

print(f"full 32-scatter bwd-like: {timed_chain(full_bwd_like, g32):8.2f} ms", flush=True)

@jax.jit
def full_bwd_rowmajor(g):
    cols = [jnp.zeros((R,), jnp.float32) for _ in range(2)]
    for l in range(16):
        rows_cm = idx16[l].reshape(-1)
        gl = g[:, 2*l:2*l+2]
        for f in range(2):
            vals = (wts0 * gl[:, f:f+1]).reshape(-1)
            cols[f] = cols[f].at[rows_cm].add(vals)
    return g * 1.0000001 + 1e-20 * (cols[0][0] + cols[1][0])

print(f"full 32-scatter row-major: {timed_chain(full_bwd_rowmajor, g32):8.2f} ms", flush=True)
