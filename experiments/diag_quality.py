#!/usr/bin/env python
"""Round-3 quality diagnosis: train at (near-)bench config with knobs and
report train-view vs held-out PSNR to isolate the generalization gap
(VERDICT round 2: train-view 23.4 dB vs held-out 15.3-17.3 dB).

Usage: python experiments/diag_quality.py --n_images 16 --steps 2000 ...
Prints one JSON line with train/held-out PSNR per render layout.
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
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hash_layout", type=str, default="brick")
    ap.add_argument("--compute_dtype", type=str, default="float32")
    ap.add_argument("--samples_per_ray", type=int, default=32)
    ap.add_argument("--sv_intervals", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--distortion_w", type=float, default=1e-3)
    ap.add_argument("--cluster_w", type=float, default=0.1,
                    help="weight for the norm_D_C_* clustering losses")
    ap.add_argument("--sem_w", type=float, default=0.04)
    ap.add_argument("--opacity_w", type=float, default=1e-3)
    ap.add_argument("--march_coarse", type=int, default=1)
    ap.add_argument("--no_dir", action="store_true",
                    help="Lambertian rgb head (rgb_use_dir=False)")
    ap.add_argument("--test_layouts", type=str, default="bucket")
    ap.add_argument("--n_test_train_views", type=int, default=2,
                    help="how many TRAIN views to also render for the gap")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
        TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=128, max_samples=1024,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3, compute_dtype=args.compute_dtype,
            hash_layout=args.hash_layout,
            rgb_use_dir=not args.no_dir,
        ),
        render=RenderConfig(march_block=1024,
                            sample_budget=args.batch * args.samples_per_ray,
                            sv_intervals=args.sv_intervals,
                            march_coarse=bool(args.march_coarse)),
        loss=LossConfig(
            opacity_w=args.opacity_w, distortion_w=args.distortion_w,
            norm_D_C_ort_dot_w=args.cluster_w,
            norm_D_C_centr_dot_w=args.cluster_w,
            norm_D_C_centr_L1_w=args.cluster_w,
            norm_can_tres=0.3 if args.cluster_w else 0.0,
            sem_w=args.sem_w,
        ),
        data=DataConfig(batch_size=args.batch,
                        ray_sampling_strategy="all_images_triang"),
        # 4 cosine-annealed epochs like the reference schedule
        # (train_nerf.py:287-291, opt.py num_epochs=4)
        optim=OptimConfig(lr=args.lr, num_epochs=4,
                          steps_per_epoch=max(args.steps // 4, 1)),
    )
    scene_tr = SyntheticDataset(split="train", img_wh=(args.img, args.img),
                                n_images=args.n_images).load()
    scene_te = SyntheticDataset(split="test", img_wh=(args.img, args.img),
                                n_images=4).load()
    trainer = Trainer(cfg, scene_tr, scene_te)
    _log(f"training {args.steps} steps, {args.n_images} views, "
         f"{args.hash_layout}, lr={args.lr}")
    m = trainer.fit(log_every=500, log_fn=_log)
    _log(f"final train-batch psnr {m['psnr']:.2f}")

    out = {"n_images": args.n_images, "steps": args.steps,
           "hash_layout": args.hash_layout, "lr": args.lr,
           "train_batch_psnr": round(m["psnr"], 2)}

    def psnr_of(pred, gt):
        mse = float(np.mean((np.asarray(pred) - gt) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    W, H = scene_te.img_wh
    for layout in args.test_layouts.split(","):
        trainer.cfg = cfg.replace(render=cfg.render.__class__(
            **{**cfg.render.__dict__, "test_layout": layout}))
        # held-out
        ps = []
        for i in range(scene_te.n_images):
            res = trainer.render_image(scene_te.poses[i])
            gt = scene_te.rays[i, :, :3].reshape(H, W, 3)
            ps.append(psnr_of(res["rgb"], gt))
        out[f"heldout_psnr_{layout}"] = round(float(np.mean(ps)), 2)
        out[f"heldout_psnr_{layout}_per_im"] = [round(p, 2) for p in ps]
        # train views through the SAME inference renderer
        ps_tr = []
        for i in range(args.n_test_train_views):
            res = trainer.render_image(scene_tr.poses[i])
            gt = scene_tr.rays[i, :, :3].reshape(H, W, 3)
            ps_tr.append(psnr_of(res["rgb"], gt))
        out[f"trainview_psnr_{layout}"] = round(float(np.mean(ps_tr)), 2)
        _log(f"{layout}: held-out {out[f'heldout_psnr_{layout}']} "
             f"train-view {out[f'trainview_psnr_{layout}']}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
