"""Clean-process comparison: tcnn vs brick hash layouts, march, MLPs.

MUST stay free of device->host transfers (axon degraded-mode trap).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.models.brick_hash import (
    BrickGridSpec, brick_encode, init_brick_table,
)
from normal_clustering_nerf_tpu.models.hash_encoding import (
    HashGridSpec, hash_encode, init_hash_table,
)
from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train


def timed(fn, *a, n=20):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
M = 262144
x = jnp.asarray(rng.uniform(0, 1, (M, 3)).astype(np.float32))

bspec = BrickGridSpec.create(n_levels=16, n_features=2, log2_bricks=13,
                             base_res=16, per_level_scale=1.3819)
hspec = HashGridSpec.create(n_levels=16, n_features=2, log2_table_size=19,
                            base_res=16, per_level_scale=1.3819)
btab = init_brick_table(jax.random.PRNGKey(0), bspec)
htab = init_hash_table(jax.random.PRNGKey(0), hspec)

bf = jax.jit(lambda t, x: brick_encode(t, x, bspec))
hf = jax.jit(lambda t, x: hash_encode(t, x, hspec))
print(f"brick fwd:     {timed(bf, btab, x):8.3f} ms", flush=True)
print(f"tcnn  fwd:     {timed(hf, htab, x):8.3f} ms", flush=True)

bb = jax.jit(lambda t, x: jax.grad(
    lambda t: jnp.sum(brick_encode(t, x, bspec)))(t))
hb = jax.jit(lambda t, x: jax.grad(
    lambda t: jnp.sum(hash_encode(t, x, hspec)))(t))
print(f"brick fwd+bwd: {timed(bb, btab, x):8.3f} ms", flush=True)
print(f"tcnn  fwd+bwd: {timed(hb, htab, x):8.3f} ms", flush=True)

# march at bench shape
N, S, B = 8192, 1024, 262144
G, scale = 128, 0.5
rays_o = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
d = rng.standard_normal((N, 3)).astype(np.float32)
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
hits = jnp.stack([jnp.asarray(rng.uniform(0, 0.1, N).astype(np.float32)),
                  jnp.full((N,), 1.2)], axis=1)
bitfield = jnp.asarray(rng.integers(0, 256, G ** 3 // 8, dtype=np.uint8))
noise = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
mf = jax.jit(lambda o, dd, h, bfd, nz: march_rays_train(
    o, dd, h, bfd, nz, cascades=1, scale=scale, exp_step_factor=0.0,
    grid_size=G, max_samples=1024, sample_budget=B,
    march_steps=S, per_ray_cap=32))
print(f"march:         {timed(mf, rays_o, rays_d, hits, bitfield, noise):8.3f} ms", flush=True)

# MLP stack at sample scale: sigma 32->64->16, rgb 19->64->64->3 etc
W1 = jnp.asarray(rng.standard_normal((32, 64), dtype=np.float32) * 0.1)
W2 = jnp.asarray(rng.standard_normal((64, 16), dtype=np.float32) * 0.1)
feat = jnp.asarray(rng.standard_normal((M, 32), dtype=np.float32))
mlp = jax.jit(lambda f, a, b: jnp.maximum(f @ a, 0) @ b)
print(f"sigma mlp fwd: {timed(mlp, feat, W1, W2):8.3f} ms", flush=True)
