"""Chained-input probes: each call depends on the previous result, so no
backend memoization of identical executions can fake the timing."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT, _apply_mlp
from normal_clustering_nerf_tpu.models.hash_encoding import hash_encode
from normal_clustering_nerf_tpu.ops.trunc_exp import trunc_exp


def timed_chain(fn, x0, n=10):
    """fn: x -> x (same shape); chained n times."""
    x = fn(x0); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                   pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
                   n_sem_cls=3)
model = NGPMT(mcfg)
params = model.init(jax.random.PRNGKey(0))
M = 262144
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.uniform(-0.45, 0.45, (M, 3)).astype(np.float32))
dirs = jnp.asarray(rng.standard_normal((M, 3)).astype(np.float32))
spec = model.grid_spec


@jax.jit
def hash_fwd_chain(x):
    e = hash_encode(params["hash_table"], (x + 0.5), spec)
    # fold the output back into positions (keeps values in range)
    return x + 1e-9 * jnp.tanh(e[:, :3])


print(f"hash fwd chained : {timed_chain(hash_fwd_chain, xyz):8.2f} ms", flush=True)


@jax.jit
def field_bwd_chain(x):
    def f(p):
        out = model(p, x, dirs)
        return (jnp.sum(out["sigmas"]) + jnp.sum(out["rgbs"])
                + jnp.sum(out["sems"]) + jnp.sum(out["norms"]))
    g = jax.grad(f)(params)
    return x + 1e-12 * jnp.sum(g["hash_table"]) * jnp.ones_like(x)


print(f"field fwd+bwd ch : {timed_chain(field_bwd_chain, xyz):8.2f} ms", flush=True)


@jax.jit
def hash_bwd_chain(x):
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x + 0.5, spec)))(
        params["hash_table"])
    return x + 1e-12 * jnp.sum(g) * jnp.ones_like(x)


print(f"hash fwd+bwd ch  : {timed_chain(hash_bwd_chain, xyz):8.2f} ms", flush=True)


@jax.jit
def mlp_bwd_chain(x):
    enc = jnp.tile(x, (1, 11))[:, :32]
    def f(p):
        h = _apply_mlp(p["sigma_net"], enc)
        sig = trunc_exp(h[:, 0])
        dn = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        rgb = _apply_mlp(p["rgb_net"], jnp.concatenate([dn, h], 1), out_act="sigmoid")
        sem = _apply_mlp(p["sem_net"], h)
        nor = _apply_mlp(p["norm_net"], h)
        return jnp.sum(sig) + jnp.sum(rgb) + jnp.sum(sem) + jnp.sum(nor)
    g = jax.grad(f)(params)
    return x + 1e-12 * jnp.sum(g["sigma_net"]["w0"]) * jnp.ones_like(x)


print(f"mlps fwd+bwd ch  : {timed_chain(mlp_bwd_chain, xyz):8.2f} ms", flush=True)
