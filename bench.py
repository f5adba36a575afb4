#!/usr/bin/env python
"""Training-throughput benchmark on real hardware.

Trains the full multi-task NGP-MT pipeline (hash grid, occupancy
marching, N-channel compositing, normal-clustering losses) on the
synthetic Manhattan room at the reference's production shape
(batch 8192 rays, grid 128, L=16 hash levels — opt.py:46,138) and
reports steady-state ray throughput.

Baseline: the reference runs ~30 it/s x 8192 rays ~= 0.25 M rays/s on
an RTX 2080 Ti (BASELINE.md). Prints one JSON line.
"""
import json
import sys
import time

T0 = time.time()


def _log(msg):
    print(f"[bench {time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
        TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    batch = 8192
    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=128, max_samples=1024,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3,
        ),
        render=RenderConfig(march_block=1024, sample_budget=batch * 32),
        loss=LossConfig(
            opacity_w=1e-3, distortion_w=1e-3,
            norm_D_C_ort_dot_w=0.1, norm_D_C_centr_dot_w=0.1,
            norm_D_C_centr_L1_w=0.1, norm_can_tres=0.3,
            sem_w=0.04,
        ),
        data=DataConfig(batch_size=batch,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
    )
    _log("building scene + trainer")
    scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
    trainer = Trainer(cfg, scene)
    _log("marking invisible cells")
    trainer.mark_invisible_cells()
    jax.block_until_ready(trainer.state.occ.density_grid)

    # warmup: let the occupancy grid converge so the march reflects
    # steady-state sparsity (as in real training)
    _log("warmup: compiling occupancy update + train step")
    warm_steps = 128
    for step in range(warm_steps):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(7), step)
            occ = trainer._occ_update[step < cfg.optim.warmup_steps](
                trainer.state.occ, trainer.state.params, k)
            trainer.state = trainer.state._replace(occ=occ)
            if step == 0:
                jax.block_until_ready(occ.density_grid)
                _log("occ warmup update compiled")
        trainer.state, metrics = trainer._train_step(
            trainer.state, trainer.scene_dev)
        if step == 0:
            jax.block_until_ready(trainer.state.params)
            _log("train step compiled")
        if step == 16:
            _log("regular occ update compiled")
    jax.block_until_ready(trainer.state.params)
    _log(f"warmup done ({warm_steps} steps)")

    n_steps = 200
    t0 = time.perf_counter()
    for _ in range(n_steps):
        trainer.state, metrics = trainer._train_step(
            trainer.state, trainer.scene_dev)
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0

    rays_per_s = batch * n_steps / dt
    baseline = 0.25e6  # RTX 2080 Ti reference throughput (BASELINE.md)
    print(json.dumps({
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
