import time
import jax
import jax.numpy as jnp

def timed_chain(make, v0, n=10, label=""):
    f = jax.jit(make)
    t0 = time.perf_counter()
    v = f(v0); jax.block_until_ready(v)
    print(f"{label} compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        v = f(v)
    jax.block_until_ready(v)
    print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)

k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 24)
dev_randn = lambda key, shape: jax.jit(lambda kk: jax.random.normal(kk, shape))(key)
dev_randint = lambda key, shape, mx: jax.jit(lambda kk: jax.random.randint(kk, shape, 0, mx, jnp.int32))(key)

M = 262144
# 16 per-level row scatters into 16 separate (8192,128) tables, ONE jit
idx16 = [dev_randint(ks[i], (M,), 8192) for i in range(16)]
w64 = jax.jit(lambda kk: jax.random.uniform(kk, (M, 64)))(ks[16])
gf = dev_randn(ks[17], (M, 32))

def mk_16scatters(g):
    acc = 0.0
    for l in range(16):
        upd = (w64[:, :, None] * g[:, 2*l:2*l+2][:, None, :]).reshape(M, 128)
        out = jnp.zeros((8192, 128), jnp.float32).at[idx16[l]].add(upd)
        acc = acc + out[0, 0]
    return g * 1.0000001 + 1e-20 * acc
timed_chain(mk_16scatters, gf, label="16x per-level row scatter 262k->4MB")

M2 = 65536
idx16b = [dev_randint(ks[i], (M2,), 8192) for i in range(16)]
w64b = jax.jit(lambda kk: jax.random.uniform(kk, (M2, 64)))(ks[18])
def mk_16s_small(g):
    acc = 0.0
    for l in range(16):
        upd = (w64b[:, :, None] * g[:, 2*l:2*l+2][:, None, :]).reshape(M2, 128)
        out = jnp.zeros((8192, 128), jnp.float32).at[idx16b[l]].add(upd)
        acc = acc + out[0, 0]
    return g * 1.0000001 + 1e-20 * acc
gfb = dev_randn(ks[19], (M2, 32))
timed_chain(mk_16s_small, gfb, label="16x per-level row scatter 65k->4MB")

# 16 per-level row gathers (fwd), one jit: (262k,128) each + combine
tabs = [dev_randn(ks[i], (8192, 128)) for i in range(16)]
def mk_16gather(g):
    feats = []
    for l in range(16):
        rows = tabs[l][idx16[l]]                      # (M,128)
        feats.append(jnp.sum(rows.reshape(M, 64, 2) * w64[:, :, None], axis=1))
    out = jnp.concatenate(feats, axis=-1)
    return g * 1.0000001 + 1e-20 * out[0, 0]
timed_chain(mk_16gather, gf, label="16x per-level row gather+combine 262k")
