import time
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.models.hash_encoding import hash_encode

def timed_chain(fn, x0, n=10):
    x = fn(x0); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3

mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024)
model = NGPMT(mcfg)
params = model.init(jax.random.PRNGKey(0))
M = 262144
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.uniform(-0.45, 0.45, (M, 3)).astype(np.float32))
spec = model.grid_spec
table = params["hash_table"]
w0 = jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))

@jax.jit
def hash_bwd_cot(w):
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, xyz + 0.5, spec) * w))(table)
    return w * 1.0000001 + 1e-20 * jnp.sum(g)

print(f"hash bwd, array cotangent: {timed_chain(hash_bwd_cot, w0):8.2f} ms", flush=True)

@jax.jit
def hash_bwd_ones_chain(w):
    # ones cotangent but chained through x-equivalent: vary table instead
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, xyz + 0.5, spec)))(
        table + 1e-20 * jnp.sum(w))
    return w * 1.0000001 + 1e-20 * jnp.sum(g)

print(f"hash bwd, ones cotangent : {timed_chain(hash_bwd_ones_chain, w0):8.2f} ms", flush=True)
