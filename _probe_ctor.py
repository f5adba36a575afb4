"""Bisect Trainer.__init__ for the device-degradation trigger."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
bf = jnp.asarray(rng.integers(0, 256, 128 ** 3 // 8, dtype=np.uint8))
idx = jnp.asarray(rng.integers(0, 128 ** 3, (8192, 1024), dtype=np.int32))
gath = jax.jit(lambda bf, i: (bf[i >> 3] >> (i & 7).astype(jnp.uint8)) & jnp.uint8(1))


def rep(tag):
    print(f"[{tag:34s}] gath {timed(gath, bf, idx):8.3f} ms", flush=True)


rep("fresh")

from normal_clustering_nerf_tpu.config import (
    DataConfig, ModelConfig, OptimConfig, RenderConfig, TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset

cfg = TrainConfig(
    model=ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                      pred_norm_nn=True, pred_norm_depth=True,
                      pred_sem=True, n_sem_cls=3),
    render=RenderConfig(march_block=1024, sample_budget=8192 * 32),
    data=DataConfig(batch_size=8192,
                    ray_sampling_strategy="all_images_triang"),
    optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
)
scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
rep("after scene load")

from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.models.occupancy import OccupancyGrid

model = NGPMT(cfg.model)
occg = OccupancyGrid(cfg.model)
rep("after model ctor")

from normal_clustering_nerf_tpu.datasets.sampler import RaySampler

sampler = RaySampler(cfg.data.ray_sampling_strategy, cfg.data.batch_size,
                     scene.img_wh, scene.n_images)
rep("after RaySampler (triang tables)")

from normal_clustering_nerf_tpu.training.trainer import _scene_to_device

scene_dev = _scene_to_device(scene)
jax.block_until_ready(scene_dev.images)
rep("after scene_to_device")

from normal_clustering_nerf_tpu.training.state import create_train_state

state, tx = create_train_state(cfg, model, occg, jax.random.PRNGKey(0),
                               scene.n_images)
jax.block_until_ready(state.params)
rep("after create_train_state")
