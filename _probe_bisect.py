"""Bisect why march/hash are ~100x slower inside the trainer process."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.training import Trainer
from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train
from normal_clustering_nerf_tpu.ops.ray_aabb import ray_aabb_intersect


def timed(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
N, S, B = 8192, 1024, 262144
G, scale, max_samples = 128, 0.5, 1024

batch = 8192
cfg = TrainConfig(
    model=ModelConfig(
        scale=0.5, grid_size=128, max_samples=1024,
        pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
        n_sem_cls=3,
    ),
    render=RenderConfig(march_block=1024, sample_budget=batch * 32),
    data=DataConfig(batch_size=batch,
                    ray_sampling_strategy="all_images_triang"),
    optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
)
mcfg = cfg.model
print(f"exp_step_factor = {mcfg.exp_step_factor}", flush=True)

# ---------- synthetic inputs, BEFORE any trainer work
rays_o_s = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
d = rng.standard_normal((N, 3)).astype(np.float32)
rays_d_s = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
hits_s = jnp.stack(
    [jnp.asarray(rng.uniform(0, 0.1, N).astype(np.float32)),
     jnp.full((N,), 1.2)], axis=1)
bitfield_s = jnp.asarray(rng.integers(0, 256, G ** 3 // 8, dtype=np.uint8))
noise_s = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))

march = jax.jit(lambda o, dd, h, bf, nz: march_rays_train(
    o, dd, h, bf, nz, cascades=mcfg.cascades, scale=mcfg.scale,
    exp_step_factor=mcfg.exp_step_factor, grid_size=mcfg.grid_size,
    max_samples=mcfg.max_samples, sample_budget=B,
    march_steps=cfg.render.march_block, per_ray_cap=B // N))

print(f"march pre-trainer (synth inputs):  "
      f"{timed(march, rays_o_s, rays_d_s, hits_s, bitfield_s, noise_s):8.2f} ms",
      flush=True)

# ---------- build trainer + converge occupancy (as the profiler does)
scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
trainer = Trainer(cfg, scene)
trainer.mark_invisible_cells()
for step in range(128):
    if step % cfg.optim.update_interval == 0:
        k = jax.random.fold_in(jax.random.PRNGKey(7), step)
        occ = trainer._occ_update[step < cfg.optim.warmup_steps](
            trainer.state.occ, trainer.state.params, k)
        trainer.state = trainer.state._replace(occ=occ)
    trainer.state, _ = trainer._train_step(trainer.state, trainer.scene_dev)
jax.block_until_ready(trainer.state.params)
print("trainer warm", flush=True)

print(f"march post-trainer (synth inputs): "
      f"{timed(march, rays_o_s, rays_d_s, hits_s, bitfield_s, noise_s):8.2f} ms",
      flush=True)

# ---------- profiler-style inputs
state = trainer.state
bitfield = state.occ.density_bitfield
key = jax.random.PRNGKey(0)
batch_idx = trainer.sampler.sample(key)
rays_o, rays_d = jax.jit(trainer._assemble_rays)(
    state.params, batch_idx, trainer.scene_dev)
hits = jax.jit(lambda o, d: ray_aabb_intersect(
    o, d, jnp.zeros(3), jnp.full(3, mcfg.scale)))(rays_o, rays_d)
noise = jax.random.uniform(key, (N,))
jax.block_until_ready((rays_o, hits))

print(f"march post-trainer (real inputs):  "
      f"{timed(march, rays_o, rays_d, hits, bitfield, noise):8.2f} ms",
      flush=True)
print(f"march real rays, synth bitfield:   "
      f"{timed(march, rays_o, rays_d, hits, bitfield_s, noise):8.2f} ms",
      flush=True)
