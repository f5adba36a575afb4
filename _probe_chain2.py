import time
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT, _apply_mlp
from normal_clustering_nerf_tpu.models.hash_encoding import hash_encode
from normal_clustering_nerf_tpu.ops.trunc_exp import trunc_exp


def timed_chain(fn, x0, n=10):
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
spec = model.grid_spec
table = params["hash_table"]


@jax.jit
def hash_bwd_cot(x):
    # non-constant cotangent derived from x
    w = jnp.tile(jnp.tanh(x), (1, 11))[:, :32]
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x + 0.5, spec) * w))(table)
    return x + 1e-12 * jnp.sum(g) * jnp.ones_like(x)


print(f"hash bwd, real cotangent : {timed_chain(hash_bwd_cot, xyz):8.2f} ms", flush=True)


@jax.jit
def hash_sigma_bwd(x):
    # hash -> sigma_net -> trunc_exp only (no other heads)
    def f(p):
        e = hash_encode(p["hash_table"], x + 0.5, spec)
        h = _apply_mlp(p["sigma_net"], e)
        return jnp.sum(trunc_exp(h[:, 0]))
    g = jax.grad(f)(params)
    return x + 1e-12 * jnp.sum(g["hash_table"]) * jnp.ones_like(x)


print(f"hash+sigma fwd+bwd       : {timed_chain(hash_sigma_bwd, xyz):8.2f} ms", flush=True)


@jax.jit
def hash_sigma_only_bwd(x):
    def f(p):
        e = hash_encode(p["hash_table"], x + 0.5, spec)
        h = _apply_mlp(p["sigma_net"], e)
        return jnp.sum(h)
    g = jax.grad(f)(params)
    return x + 1e-12 * jnp.sum(g["hash_table"]) * jnp.ones_like(x)


print(f"hash+sigma(no texp) bwd  : {timed_chain(hash_sigma_only_bwd, xyz):8.2f} ms", flush=True)
