import time
import jax
import jax.numpy as jnp

k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 4)
M = 262144
idx = jax.jit(lambda kk: jax.random.randint(kk, (M,), 0, 8192, jnp.int32))(ks[0])
w64 = jax.jit(lambda kk: jax.random.uniform(kk, (M, 64)))(ks[1])
tab = jax.jit(lambda kk: jax.random.normal(kk, (8192, 128)))(ks[2])

@jax.jit
def gather1(shift):
    rows = tab[(idx + shift) & 8191]
    out = jnp.sum(rows.reshape(M, 64, 2) * w64[:, :, None], axis=1)
    return shift + 1 + 0 * jnp.sum(out[0]).astype(jnp.int32)

s = jnp.zeros((), jnp.int32)
t0 = time.perf_counter()
s = gather1(s); jax.block_until_ready(s)
print(f"compiled {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    s = gather1(s)
jax.block_until_ready(s)
print(f"1x row gather 262k x128 + combine: {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

# raw gather only
@jax.jit
def gather_raw(shift):
    rows = tab[(idx + shift) & 8191]
    return shift + 1 + 0 * rows[0, 0].astype(jnp.int32)
s = jnp.zeros((), jnp.int32)
t0 = time.perf_counter()
s = gather_raw(s); jax.block_until_ready(s)
print(f"raw compiled {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    s = gather_raw(s)
jax.block_until_ready(s)
print(f"1x row gather 262k x128 raw: {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)
