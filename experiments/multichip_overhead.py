#!/usr/bin/env python
"""Sharded-vs-single step overhead on a virtual 8-device CPU mesh.

The BASELINE >=85% scaling-efficiency target needs >1 real chip, which
this environment doesn't have (one axon-tunneled v5e). This records the
next-best committed number: the shard_map step's dispatch+collective
OVERHEAD on an 8-process-local-device CPU mesh at equal GLOBAL batch —
an upper bound on the per-step fixed costs that would eat into real
multi-chip efficiency (the real run adds ICI all-reduce of ~12 MB of
grads, which XLA overlaps with the backward).

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/multichip_overhead.py
Writes MULTICHIP_OVERHEAD.json at the repo root.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(num_chips, batch):
    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, ParallelConfig,
        RenderConfig, TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    cfg = TrainConfig(
        model=ModelConfig(scale=0.5, grid_size=64, max_samples=256,
                          pred_norm_nn=True, pred_sem=True, n_sem_cls=3,
                          n_levels=8, log2_bricks=10),
        render=RenderConfig(march_block=256, sample_budget=batch * 16),
        loss=LossConfig(opacity_w=1e-3, norm_D_C_ort_dot_w=0.1,
                        norm_can_tres=0.3),
        data=DataConfig(batch_size=batch,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=100),
        parallel=ParallelConfig(mesh_shape=(num_chips,)),
    )
    scene = SyntheticDataset(split="train", img_wh=(64, 64), n_images=8).load()
    return Trainer(cfg, scene), cfg


def time_steps(trainer, cfg, n=30):
    import jax
    step_fn = trainer.step_fns(10 ** 9)[0]  # post-bootstrap single step
    state = trainer.state
    state, m = step_fn(state, trainer.scene_dev)      # compile
    jax.block_until_ready(m["psnr"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step_fn(state, trainer.scene_dev)
    jax.block_until_ready(m["psnr"])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"
    batch = 4096

    tr1, cfg1 = build(1, batch)
    tr1.mark_invisible_cells()
    t1 = time_steps(tr1, cfg1)
    tr8, cfg8 = build(8, batch)
    tr8.mark_invisible_cells()
    t8 = time_steps(tr8, cfg8)

    out = {
        "platform": jax.devices()[0].platform,
        "global_batch": batch,
        "single_step_s": round(t1, 5),
        "sharded8_step_s": round(t8, 5),
        # CPU mesh shares one physical socket, so sharded time ~= single
        # time + fixed overhead; report the overhead ratio (1.0 = free)
        "overhead_ratio": round(t8 / t1, 3),
        "note": "virtual 8-device CPU mesh: same silicon, so this is "
                "dispatch+collective overhead, not real scaling. Real "
                "multi-chip efficiency = 1/overhead_ratio at equal "
                "per-chip batch if ICI collectives fully overlap.",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTICHIP_OVERHEAD.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
