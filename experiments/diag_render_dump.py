#!/usr/bin/env python
"""Train at the bench config, then dump held-out + train-view renders
(pred vs GT pngs + error maps) for visual inspection of the ~17 dB
held-out ceiling."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def save_png(path, arr):
    import cv2
    arr = np.clip(np.asarray(arr, np.float32), 0, 1)
    cv2.imwrite(path, (arr[..., ::-1] * 255).astype(np.uint8))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
        TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    steps = int(os.environ.get("STEPS", 2000))
    n_images = int(os.environ.get("NIMG", 16))
    cw = float(os.environ.get("CLUSTER_W", 0.1))
    sw = float(os.environ.get("SEM_W", 0.04))
    cfg = TrainConfig(
        model=ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                          pred_norm_nn=True, pred_norm_depth=True,
                          pred_sem=True, n_sem_cls=3),
        render=RenderConfig(march_block=1024, sample_budget=8192 * 32),
        loss=LossConfig(opacity_w=1e-3, distortion_w=1e-3,
                        norm_D_C_ort_dot_w=cw, norm_D_C_centr_dot_w=cw,
                        norm_D_C_centr_L1_w=cw,
                        norm_can_tres=0.3 if cw else 0.0,
                        sem_w=sw),
        data=DataConfig(batch_size=8192,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=4, steps_per_epoch=max(steps // 4, 1)),
    )
    scene_tr = SyntheticDataset(split="train", img_wh=(128, 128),
                                n_images=n_images).load()
    scene_te = SyntheticDataset(split="test", img_wh=(128, 128),
                                n_images=4).load()
    trainer = Trainer(cfg, scene_tr, scene_te)
    trainer.fit(log_every=500, log_fn=lambda m: print(m, flush=True))

    out = os.environ.get("OUT", "/tmp/render_dump")
    os.makedirs(out, exist_ok=True)
    W, H = scene_te.img_wh

    # discriminator: a NEVER-TRAINED pose built from the train scene's
    # own machinery (midpoint position, lookat between two train
    # targets) with analytic GT — if this renders well while the test
    # split doesn't, the test split itself is inconsistent
    from normal_clustering_nerf_tpu.datasets.synthetic import (
        _lookat_pose, _trace_room,
    )
    p0, p1 = scene_tr.poses[0], scene_tr.poses[1]
    pos = (p0[:, 3] + p1[:, 3]) / 2
    fwd = p0[:, 2] + p1[:, 2]
    fwd = fwd / np.linalg.norm(fwd)
    pose_mid = _lookat_pose(pos, pos + fwd, np.array([0.0, -1.0, 0.0]))
    rd = scene_tr.directions @ pose_mid[:, :3].T
    ro = np.broadcast_to(pose_mid[:, 3], rd.shape)
    rgb_mid, depth_mid, _, _ = _trace_room(ro, rd, 0.4)
    res = trainer.render_image(pose_mid)
    pred = np.asarray(res["rgb"]).reshape(H, W, 3)
    gt_mid = rgb_mid.reshape(H, W, 3)
    mse = float(np.mean((pred - gt_mid) ** 2))
    print(f"interp-pose: psnr={-10 * np.log10(max(mse, 1e-12)):.2f}",
          flush=True)
    save_png(f"{out}/interp_pred.png", pred)
    save_png(f"{out}/interp_gt.png", gt_mid)

    for tag, scene, idxs in (("test", scene_te, [0, 1]),
                             ("train", scene_tr, [0, 1])):
        for i in idxs:
            res = trainer.render_image(scene.poses[i])
            gt = scene.rays[i, :, :3].reshape(H, W, 3)
            pred = np.asarray(res["rgb"])
            mse = float(np.mean((pred - gt) ** 2))
            p = -10 * np.log10(max(mse, 1e-12))
            err = np.abs(pred - gt).mean(-1)
            save_png(f"{out}/{tag}{i}_pred.png", pred)
            save_png(f"{out}/{tag}{i}_gt.png", gt)
            save_png(f"{out}/{tag}{i}_err.png",
                     np.repeat(err[..., None] * 3, 3, -1))
            d = np.asarray(res["depth"])
            dg = scene.labels["depth"][i].reshape(H, W)
            save_png(f"{out}/{tag}{i}_depth.png",
                     np.repeat((d / 1.2)[..., None], 3, -1))
            save_png(f"{out}/{tag}{i}_depthgt.png",
                     np.repeat((dg / 1.2)[..., None], 3, -1))
            o = np.asarray(res["opacity"])
            print(f"{tag}{i}: psnr={p:.2f} opacity[min/mean]="
                  f"{o.min():.3f}/{o.mean():.3f} "
                  f"depth_rmse={np.sqrt(np.mean((d - dg) ** 2)):.4f}",
                  flush=True)
    np.save(f"{out}/meta.npy", {})


if __name__ == "__main__":
    main()
