#!/usr/bin/env python
"""CPU-scale replica of bench.py: the REAL Trainer (occupancy updates,
bootstrap, multi-task losses, validate) on a reduced config, with
validation visualisations saved — the fast iteration bed for bench
quality work (a tunneled-TPU bench run costs ~10 min; this ~6 min on
CPU and it saves images).

Env knobs: STEPS=1500 NIMG=24 WH=64 BATCH=2048 G=64 LEVELS=8 OUT=/tmp/minibench
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    t0 = time.time()
    import jax
    from normal_clustering_nerf_tpu.config import (
        DataConfig, EvalConfig, LossConfig, ModelConfig, OptimConfig,
        RenderConfig, TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    STEPS = int(os.environ.get("STEPS", 1500))
    NIMG = int(os.environ.get("NIMG", 24))
    WH = int(os.environ.get("WH", 64))
    BATCH = int(os.environ.get("BATCH", 2048))
    G = int(os.environ.get("G", 64))
    LEVELS = int(os.environ.get("LEVELS", 8))
    OUT = os.environ.get("OUT", "/tmp/minibench")

    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=G, max_samples=512,
            n_levels=LEVELS, log2_bricks=11, log2_hashmap_size=17,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3,
            rgb_use_dir=bool(int(os.environ.get("USE_DIR", 1))),
        ),
        render=RenderConfig(
            march_block=512,
            sample_budget=BATCH * int(os.environ.get("K", 32)),
            anneal_strategy=os.environ.get("ANNEAL", "avoid_near"),
            anneal_steps=int(os.environ.get("ANNEAL_STEPS", 450)),
            bootstrap_steps=int(os.environ.get("BOOT", 384)),
            bootstrap_max_samples=128,
        ),
        loss=LossConfig(
            opacity_w=float(os.environ.get("OPACITY_W", 1e-3)),
            distortion_w=float(os.environ.get("DISTORTION_W", 1e-3)),
            norm_D_C_ort_dot_w=float(os.environ.get("CLUST_W", 0.1)),
            norm_D_C_centr_dot_w=float(os.environ.get("CLUST_W", 0.1)),
            norm_D_C_centr_L1_w=float(os.environ.get("CLUST_W", 0.1)),
            norm_can_tres=float(os.environ.get("TRES", 0.3)),
            norm_can_start=int(os.environ.get("CLUST_START", 0)),
            norm_can_grow=float(os.environ.get("CLUST_GROW", 1)),
            sem_w=float(os.environ.get("SEM_W", 0.04)),
        ),
        data=DataConfig(batch_size=BATCH,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=STEPS),
        eval=EvalConfig(),
    )
    scene_tr = SyntheticDataset(split="train", img_wh=(WH, WH),
                                n_images=NIMG).load()
    scene_te = SyntheticDataset(split="test", img_wh=(WH, WH),
                                n_images=2).load()
    tr = Trainer(cfg, scene_tr, scene_te)
    print(f"[{time.time()-t0:.0f}s] fit {STEPS} steps", flush=True)
    m = tr.fit(log_every=STEPS // 8, log_fn=lambda s: print(
        f"[{time.time()-t0:.0f}s] {s}", flush=True))
    os.makedirs(OUT, exist_ok=True)
    val = tr.validate(save_vis_dir=OUT)
    keys = ("psnr", "ssim", "depth_rmse", "norm_depth_ang_mean",
            "norm_nn_ang_mean", "miou")
    print(f"[{time.time()-t0:.0f}s] VAL " + " ".join(
        f"{k}={val[k]:.3f}" for k in keys if k in val), flush=True)
    print(f"vis -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
