"""Minimal repro: what makes every later dispatch ~1000x slower?

Stages: time small ops fresh -> after big alloc -> after train-step
compile+run -> after deleting trainer. Also vary call count to split
per-call overhead from compute.
"""
import gc
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
x = jnp.asarray(rng.standard_normal((8192, 1024), dtype=np.float32))
bf = jnp.asarray(rng.integers(0, 256, 128 ** 3 // 8, dtype=np.uint8))
idx = jnp.asarray(rng.integers(0, 128 ** 3, (8192, 1024), dtype=np.int32))

add1 = jax.jit(lambda x: x * 1.0000001 + 0.5)
gath = jax.jit(lambda bf, i: (bf[i >> 3] >> (i & 7).astype(jnp.uint8)) & jnp.uint8(1))
multi = jax.jit(lambda x: (x + 1, x * 2, x - 3, jnp.cumsum(x, -1),
                           x ** 2, jnp.sqrt(jnp.abs(x)), x / 7))


def report(tag):
    print(f"[{tag}] add1  n=10 {timed(add1, x):8.3f}  n=50 {timed(add1, x, n=50):8.3f} ms", flush=True)
    print(f"[{tag}] gath  n=10 {timed(gath, bf, idx):8.3f} ms", flush=True)
    print(f"[{tag}] multi n=10 {timed(multi, x):8.3f} ms", flush=True)


report("fresh")

# big allocations ~ trainer footprint
blobs = [jnp.zeros((64 << 20,), jnp.float32) for _ in range(4)]  # 1GB
jax.block_until_ready(blobs)
report("after 1GB alloc")
del blobs
gc.collect()

# now build + run the trainer for ONE step
from normal_clustering_nerf_tpu.config import (
    DataConfig, ModelConfig, OptimConfig, RenderConfig, TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.training import Trainer

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
trainer = Trainer(cfg, scene)
report("after Trainer ctor (pre-compile)")

trainer.state, _ = trainer._train_step(trainer.state, trainer.scene_dev)
jax.block_until_ready(trainer.state.params)
report("after ONE train step")

del trainer
gc.collect()
report("after del trainer")
