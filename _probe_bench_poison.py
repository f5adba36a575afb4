"""Find which bench stage still triggers axon degraded mode."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, n=5):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


_rng = np.random.default_rng(0)
_bf = jnp.asarray(_rng.integers(0, 256, 128 ** 3 // 8, dtype=np.uint8))
_idx = jnp.asarray(_rng.integers(0, 128 ** 3, (8192, 1024), dtype=np.int32))
_g = jax.jit(lambda bf, i: (bf[i >> 3] >> (i & 7).astype(jnp.uint8)) & jnp.uint8(1))


def chk(tag):
    print(f"[{tag:40s}] {timed(_g, _bf, _idx):9.3f} ms", flush=True)


chk("fresh")

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.training import Trainer

batch = 8192
cfg = TrainConfig(
    model=ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                      pred_norm_nn=True, pred_norm_depth=True,
                      pred_sem=True, n_sem_cls=3),
    render=RenderConfig(march_block=1024, sample_budget=batch * 32),
    loss=LossConfig(opacity_w=1e-3, distortion_w=1e-3,
                    norm_D_C_ort_dot_w=0.1, norm_D_C_centr_dot_w=0.1,
                    norm_D_C_centr_L1_w=0.1, norm_can_tres=0.3, sem_w=0.04),
    data=DataConfig(batch_size=batch,
                    ray_sampling_strategy="all_images_triang"),
    optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
)
scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
chk("after dataset")
trainer = Trainer(cfg, scene)
chk("after Trainer ctor")
trainer.mark_invisible_cells()
jax.block_until_ready(trainer.state.occ.density_grid)
chk("after mark_invisible_cells")

k = jax.random.PRNGKey(7)
occ = trainer._occ_update[True](trainer.state.occ, trainer.state.params, k)
trainer.state = trainer.state._replace(occ=occ)
jax.block_until_ready(occ.density_grid)
chk("after occ warmup update")

trainer.state, metrics = trainer._train_step(trainer.state, trainer.scene_dev)
jax.block_until_ready(trainer.state.params)
chk("after 1 train step")

for s in range(2, 18):
    if s % cfg.optim.update_interval == 0:
        occ = trainer._occ_update[False](
            trainer.state.occ, trainer.state.params, jax.random.fold_in(k, s))
        trainer.state = trainer.state._replace(occ=occ)
    trainer.state, metrics = trainer._train_step(trainer.state, trainer.scene_dev)
jax.block_until_ready(trainer.state.params)
chk("after 17 steps + regular occ update")

t0 = time.perf_counter()
for _ in range(20):
    trainer.state, metrics = trainer._train_step(trainer.state, trainer.scene_dev)
jax.block_until_ready(trainer.state.params)
print(f"train step steady: {(time.perf_counter() - t0) / 20 * 1e3:9.2f} ms", flush=True)
chk("after steady loop")
