#!/usr/bin/env python
"""Diagnose the Manhattan-clustering mechanism on the synthetic room.

The r4 bench showed norm_depth_ang_mean = 57.9 deg on a PERFECT
Manhattan room (optimum ~0 interior; the validation op itself measures
0.0004 deg on GT depth). That means rendered depth is noisy at the
1-pixel triangle scale. This script trains at (a configurable variant
of) the bench config on the real chip and reports where the noise
lives and what kills it:

  * depth abs/rmse on interior pixels (off wall-edge discontinuities)
  * norm_depth angular error: overall / interior / per-wall
  * rotation-recovery yaw/pitch/roll errors
  * the same metrics from the TRAIN (dense) renderer for one view, to
    separate field noise from bucket-renderer artifacts

Usage: python experiments/diag_manhattan.py --steps 6000 \
          --strategy all_images_triang_patch --cluster_w 2e-3
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def _log(msg):
    print(f"[diag {time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--strategy", type=str, default="all_images_triang")
    ap.add_argument("--cluster_w", type=float, default=2e-3)
    ap.add_argument("--cluster_start", type=int, default=500)
    ap.add_argument("--cluster_grow", type=int, default=2500)
    ap.add_argument("--cluster_tres", type=float, default=0.01)
    ap.add_argument("--distortion_w", type=float, default=1e-3)
    ap.add_argument("--anneal", type=str, default="avoid_near")
    ap.add_argument("--triang_expand", type=int, default=0)
    ap.add_argument("--sem_w", type=float, default=0.04)
    ap.add_argument("--hash_layout", type=str, default="triplane")
    ap.add_argument("--compute_dtype", type=str, default="float32")
    ap.add_argument("--samples_per_ray", type=int, default=32)
    ap.add_argument("--sv_intervals", type=int, default=24)
    ap.add_argument("--dump", type=str, default="",
                    help="npz path for depth/normal maps of view 0")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, ParallelConfig,
        RenderConfig, TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.normals import (
        extract_normals_from_depth_batch,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.metrics.normals import normal_angular_error
    from normal_clustering_nerf_tpu.training import Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=128, max_samples=1024,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3, hash_layout=args.hash_layout,
            compute_dtype=args.compute_dtype,
        ),
        render=RenderConfig(march_block=1024,
                            sample_budget=args.batch * args.samples_per_ray,
                            sv_intervals=args.sv_intervals,
                            anneal_strategy=args.anneal,
                            anneal_steps=600 if args.anneal != "none" else 0),
        loss=LossConfig(
            opacity_w=1e-3, distortion_w=args.distortion_w,
            norm_D_C_ort_dot_w=args.cluster_w,
            norm_D_C_centr_dot_w=args.cluster_w,
            norm_D_C_centr_L1_w=args.cluster_w,
            norm_can_tres=args.cluster_tres,
            norm_can_start=args.cluster_start,
            norm_can_grow=args.cluster_grow,
            sem_w=args.sem_w,
        ),
        data=DataConfig(batch_size=args.batch,
                        ray_sampling_strategy=args.strategy,
                        triang_max_expand=args.triang_expand),
        optim=OptimConfig(num_epochs=max(args.steps // 1000, 1),
                          steps_per_epoch=1000),
        parallel=ParallelConfig(mesh_shape=(1,)),
    )
    scene_tr = SyntheticDataset(split="train", img_wh=(128, 128),
                                n_images=48).load()
    scene_te = SyntheticDataset(split="test", img_wh=(128, 128),
                                n_images=4).load()
    trainer = Trainer(cfg, scene_tr, scene_te)
    _log("marking invisible cells")
    trainer.mark_invisible_cells()
    jax.block_until_ready(trainer.state.occ.density_grid)

    from bench import run_steps, sync
    _log(f"training {args.steps} steps")
    m = run_steps(trainer, cfg, args.steps)
    _log(f"train psnr {sync(m):.2f}")

    out = {"steps": args.steps, "strategy": args.strategy,
           "cluster_w": args.cluster_w, "train_psnr": round(sync(m), 2)}

    # ---- held-out metrics via the production validate path ----
    val = trainer.validate()
    for k in ("psnr", "norm_depth_ang_mean", "norm_depth_ang_median",
              "depth_rmse", "depth_abs", "ang/clust/yaw_abs",
              "ang/clust/pitch_abs", "ang/clust/roll_abs"):
        if k in val:
            out[k] = round(float(val[k]), 3)

    # ---- interior/edge breakdown on the test split ----
    scene = trainer.scene_test
    W, H = scene.img_wh
    gtn = scene.labels["normals"].reshape(-1, H, W, 3)
    gtd = scene.labels["depth"].reshape(-1, H, W)
    same = np.ones(gtn.shape[:3], bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sh = np.roll(np.roll(gtn, dy, axis=1), dx, axis=2)
            same &= (np.abs(sh - gtn).sum(-1) < 1e-6)
    same[:, :2, :] = False
    same[:, -2:, :] = False
    same[:, :, :2] = False
    same[:, :, -2:] = False

    all_res = trainer.render_images(list(scene.poses))
    depth = np.stack([np.asarray(r["depth"]) for r in all_res])
    nd = np.asarray(extract_normals_from_depth_batch(
        jnp.asarray(depth), jnp.asarray(scene.directions),
        jnp.asarray(scene.poses)))
    out["depth_abs_interior"] = round(
        float(np.abs(depth - gtd)[same].mean()), 5)
    # pixel-to-pixel depth roughness relative to GT (noise amplitude at
    # the triangle scale: the quantity the cross products see)
    dres = depth - gtd
    rough = np.abs(np.diff(dres, axis=2))[:, :, :-1][same[:, :, 1:-1]]
    out["depth_rough_interior"] = round(float(rough.mean()), 5)
    e_int = normal_angular_error(nd[same], gtn[same])
    out["norm_ang_interior_mean"] = round(e_int["mean_deg"], 2)
    out["norm_ang_interior_median"] = round(e_int["median_deg"], 2)
    # per-axis breakdown (|gt| axis -> which wall family)
    ax = np.argmax(np.abs(gtn), axis=-1)
    for a, name in enumerate("xyz"):
        mask = same & (ax == a)
        if mask.sum():
            e = normal_angular_error(nd[mask], gtn[mask])
            out[f"norm_ang_interior_{name}"] = round(e["mean_deg"], 2)

    # ---- train-renderer (dense) depth for view 0: excludes the bucket
    # renderer as the noise source ----
    from normal_clustering_nerf_tpu.datasets.ray_utils import get_rays
    from normal_clustering_nerf_tpu.models.rendering import render_train
    ro, rd = get_rays(jnp.asarray(scene.directions),
                      jnp.asarray(scene.poses[0]))
    dchunks = []
    key = jax.random.PRNGKey(0)
    for i in range(0, ro.shape[0], 4096):
        r = render_train(trainer.model, trainer.state.params["model"],
                         trainer.state.occ.density_bitfield,
                         ro[i:i + 4096], rd[i:i + 4096], key, cfg.render,
                         global_step=args.steps,
                         sv_mask=trainer.state.occ.sv_mask,
                         sv_payload=trainer.state.occ.sv_payload)
        dchunks.append(np.asarray(r["depth"]))
    dtr = np.concatenate(dchunks).reshape(1, H, W)
    ntr = np.asarray(extract_normals_from_depth_batch(
        jnp.asarray(dtr), jnp.asarray(scene.directions),
        jnp.asarray(scene.poses[:1])))
    e_tr = normal_angular_error(ntr[same[:1]], gtn[:1][same[:1]])
    out["norm_ang_interior_trainrender"] = round(e_tr["mean_deg"], 2)
    out["depth_abs_interior_trainrender"] = round(
        float(np.abs(dtr - gtd[:1])[same[:1]].mean()), 5)

    if args.dump:
        np.savez(args.dump, depth=depth[0], gtd=gtd[0], nd=nd[0],
                 gtn=gtn[0], same=same[0], dtr=dtr[0], nd_all=nd,
                 gtn_all=gtn)
        _log(f"dumped maps to {args.dump}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
