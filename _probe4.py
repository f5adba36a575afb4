import time
import jax
import jax.numpy as jnp
import numpy as np

def timed_chain(make, v0, n=10):
    f = jax.jit(make)
    v = f(v0); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = f(v)
    jax.block_until_ready(v)
    return (time.perf_counter() - t0) / n * 1e3

def dev_randn(key, shape, dtype=jnp.float32):
    return jax.jit(lambda k: jax.random.normal(k, shape, dtype))(key)

def dev_randint(key, shape, maxv):
    return jax.jit(lambda k: jax.random.randint(k, shape, 0, maxv, jnp.int32))(key)

k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 20)

# bitfield element gathers at march sizes
bf = jax.jit(lambda k: jax.random.randint(k, (128**3 // 8,), 0, 256, jnp.int32).astype(jnp.uint8))(ks[0])
for i, shape in enumerate(((8192, 1024), (8192, 64), (16384, 16))):
    M = shape[0] * shape[1]
    idx = dev_randint(ks[1 + i], shape, 128**3)
    def mk(x, idx=idx):
        i2 = (idx + x.astype(jnp.int32)[0, 0]) % (128**3)
        byte = bf[i2 >> 3]
        bit = (byte >> (i2 & 7).astype(jnp.uint8)) & jnp.uint8(1)
        return x * 1.0000001 + 1e-20 * bit[0, 0].astype(jnp.float32)
    v0 = jnp.ones((1, 1), jnp.float32)
    print(f"bitfield gather {M/1e6:5.2f}M: {timed_chain(mk, v0):8.2f} ms", flush=True)

x8m = dev_randn(ks[5], (8192 * 1024,))
def mk_cs(x):
    return jnp.cumsum(x) * 1.0000001
print(f"cumsum 8.4M: {timed_chain(mk_cs, x8m):8.2f} ms", flush=True)
x05 = dev_randn(ks[6], (8192 * 64,))
print(f"cumsum 524k: {timed_chain(mk_cs, x05):8.2f} ms", flush=True)

# row scatter W=128 at bigger row counts
for j, M in enumerate((1048576, 4194304)):
    R = 131072
    idx = dev_randint(ks[7 + j], (M,), R)
    v0 = dev_randn(ks[9 + j], (M, 128))
    def mk(vals, idx=idx, R=R):
        out = jnp.zeros((R, 128), jnp.float32).at[idx].add(vals)
        return vals * 1.0000001 + 1e-20 * out[0, 0]
    print(f"row scatter {M/1e6:4.1f}M x128 -> {R}: {timed_chain(mk, v0):8.2f} ms", flush=True)

R = 131072
tab = dev_randn(ks[11], (R, 128))
idx = dev_randint(ks[12], (4194304,), R)
def mk_g(t, idx=idx):
    out = t[idx]
    return t * 1.0000001 + 1e-20 * out[0, 0]
print(f"row gather 4.2M x128: {timed_chain(mk_g, tab):8.2f} ms", flush=True)

M = 262144
g16 = dev_randn(ks[13], (16 * M, 128))
w64 = jax.jit(lambda k: jax.random.uniform(k, (16 * M, 64)))(ks[14])
def mk_c(g):
    rows = g.reshape(16, M, 64, 2)
    w = w64.reshape(16, M, 64, 1)
    feats = jnp.sum(rows * w, axis=2)
    out = jnp.moveaxis(feats, 0, 1).reshape(M, 32)
    return g * 1.0000001 + 1e-20 * out[0, 0]
print(f"brick combine 16x262k: {timed_chain(mk_c, g16):8.2f} ms", flush=True)

# brick update-row build (bwd): w (16M,64) outer g(16M,2) -> (16M,128)
gf = dev_randn(ks[15], (16 * M, 2))
def mk_u(g):
    upd = (w64[:, :, None] * g[:, None, :]).reshape(16 * M, 128)
    return g * 1.0000001 + 1e-20 * upd[0, 0]
print(f"brick update build 4.2Mx128: {timed_chain(mk_u, gf):8.2f} ms", flush=True)
