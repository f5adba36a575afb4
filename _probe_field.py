"""Isolate the field-backward cost beyond the hash scatter."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT, _apply_mlp
from normal_clustering_nerf_tpu.models.hash_encoding import (
    hash_encode, _hash_encode_fwd_impl)
from normal_clustering_nerf_tpu.ops.trunc_exp import trunc_exp


def timed(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                   pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
                   n_sem_cls=3)
model = NGPMT(mcfg)
params = model.init(jax.random.PRNGKey(0))
M = 262144
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (M, 3)).astype(np.float32))
dirs = jnp.asarray(rng.standard_normal((M, 3)).astype(np.float32))
enc = jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
spec = model.grid_spec
xn = (xyz + 0.5)


def mlps_only(p, enc, d):
    h = _apply_mlp(p["sigma_net"], enc)
    sig = trunc_exp(h[:, 0])
    dn = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rgb = _apply_mlp(p["rgb_net"], jnp.concatenate([dn, h], 1), out_act="sigmoid")
    sem = _apply_mlp(p["sem_net"], h)
    nor = _apply_mlp(p["norm_net"], h)
    return jnp.sum(sig) + jnp.sum(rgb) + jnp.sum(sem) + jnp.sum(nor)


print(f"mlps fwd       : {timed(jax.jit(mlps_only), params, enc, dirs):8.2f} ms", flush=True)
g_mlp = jax.jit(lambda p, e, d: jax.grad(mlps_only)(p, e, d))
print(f"mlps fwd+bwd   : {timed(g_mlp, params, enc, dirs):8.2f} ms", flush=True)

# gradient to enc as well (this is what feeds the hash bwd)
g_mlp_e = jax.jit(lambda p, e, d: jax.grad(mlps_only, argnums=(0, 1))(p, e, d))
print(f"mlps fwd+bwd+de: {timed(g_mlp_e, params, enc, dirs):8.2f} ms", flush=True)

# hash fwd via custom vjp vs raw impl
print(f"hash fwd (vjp) : {timed(jax.jit(lambda t, x: hash_encode(t, x, spec)), params['hash_table'], xn):8.2f} ms", flush=True)
print(f"hash fwd (raw) : {timed(jax.jit(lambda t, x: _hash_encode_fwd_impl(t, x, spec)), params['hash_table'], xn):8.2f} ms", flush=True)

# full field fwd+bwd for reference
def field(p, x, d):
    out = model(p, x, d)
    return jnp.sum(out["sigmas"]) + jnp.sum(out["rgbs"]) + jnp.sum(out["sems"]) + jnp.sum(out["norms"])

print(f"field fwd      : {timed(jax.jit(field), params, xyz, dirs):8.2f} ms", flush=True)
g_field = jax.jit(lambda p, x, d: jax.grad(field)(p, x, d))
print(f"field fwd+bwd  : {timed(g_field, params, xyz, dirs):8.2f} ms", flush=True)

# hash-only fwd+bwd
g_hash = jax.jit(lambda t, x: jax.grad(lambda tt: jnp.sum(hash_encode(tt, x, spec)))(t))
print(f"hash fwd+bwd   : {timed(g_hash, params['hash_table'], xn):8.2f} ms", flush=True)

# hash fwd+bwd with a non-trivial cotangent (matches field path better)
def hash_loss(t, x, w):
    e = hash_encode(t, x, spec)
    return jnp.sum(e * w)

w = jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
g_hash2 = jax.jit(lambda t, x, w: jax.grad(hash_loss)(t, x, w))
print(f"hash fwd+bwd(w): {timed(g_hash2, params['hash_table'], xn, w):8.2f} ms", flush=True)
