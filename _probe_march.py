"""Find the hot spot inside march_rays_train on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.ops.ray_march import (
    calc_dt, compact_samples, occupancy_lookup, t_step_grid,
)


def timed(fn, *a, n=20):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
N, S, B = 8192, 1024, 262144
G, scale, cascades, max_samples, f = 128, 0.5, 1, 1024, 0.0

rays_o = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
d = rng.standard_normal((N, 3)).astype(np.float32)
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
t1 = jnp.asarray(rng.uniform(0, 0.1, N).astype(np.float32))
bitfield = jnp.asarray(rng.integers(0, 256, G ** 3 // 8, dtype=np.uint8))

tsg = jax.jit(lambda t0: t_step_grid(
    t0, S, exp_step_factor=f, max_samples=max_samples, grid_size=G,
    scale=scale))
print(f"t_step_grid:   {timed(tsg, t1):8.2f} ms", flush=True)
tg = tsg(t1)

dtt = jax.jit(lambda tg: calc_dt(tg, f, max_samples, G, scale))
dtg = dtt(tg)
print(f"calc_dt grid:  {timed(dtt, tg):8.2f} ms", flush=True)

xyzf = jax.jit(lambda o, dd, tg: o[:, None, :] + tg[..., None] * dd[:, None, :])
xyz = xyzf(rays_o, rays_d, tg)
print(f"xyz expand:    {timed(xyzf, rays_o, rays_d, tg):8.2f} ms", flush=True)

occf = jax.jit(lambda x, dt, bf: occupancy_lookup(
    x, dt, bf, cascades=cascades, scale=scale, grid_size=G))
occ = occf(xyz, dtg, bitfield)
print(f"occ lookup:    {timed(occf, xyz, dtg, bitfield):8.2f} ms", flush=True)

include = occ & (tg < 1.0)
cnt = jnp.cumsum(include.astype(jnp.int32), axis=-1)
include = include & (cnt <= 32)
include = jax.block_until_ready(include)

cf = jax.jit(lambda inc, tg, dtg: compact_samples(inc, tg, dtg, B))
print(f"compact:       {timed(cf, include, tg, dtg):8.2f} ms", flush=True)

from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train

hits = jnp.stack([t1, jnp.full((N,), 1.2)], axis=1)
noise = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
mf = jax.jit(lambda o, dd, h, bf, nz: march_rays_train(
    o, dd, h, bf, nz, cascades=cascades, scale=scale, exp_step_factor=f,
    grid_size=G, max_samples=max_samples, sample_budget=B,
    march_steps=S, per_ray_cap=32))
print(f"march whole:   {timed(mf, rays_o, rays_d, hits, bitfield, noise):8.2f} ms", flush=True)
