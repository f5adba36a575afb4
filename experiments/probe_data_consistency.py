#!/usr/bin/env python
"""Is the training data multi-view consistent?

(a) Trainer-path check: sample a real batch, assemble rays exactly as
train_step_core does, analytically re-trace those WORLD rays, and
compare to the GT rgb/depth the loss would consume. Any mismatch =
ray<->pixel pairing or convention bug.
(b) Cross-view check: unproject GT depth from image i, reproject into
image j, compare GT colors at the corresponding pixels.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from normal_clustering_nerf_tpu.config import (
    DataConfig, ModelConfig, OptimConfig, RenderConfig, TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import (
    SyntheticDataset, _trace_room,
)
from normal_clustering_nerf_tpu.training import Trainer

cfg = TrainConfig(
    model=ModelConfig(scale=0.5, grid_size=32, max_samples=128),
    render=RenderConfig(march_block=128, sample_budget=1024 * 16),
    data=DataConfig(batch_size=1024,
                    ray_sampling_strategy="all_images_triang"),
    optim=OptimConfig(num_epochs=1, steps_per_epoch=10),
)
ds = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16)
scene = ds.load()
trainer = Trainer(cfg, scene)

# ---------------- (a) trainer-path consistency
key = jax.random.PRNGKey(0)
batch = trainer.sampler.sample(key)
sc = trainer.scene_dev
target_rgb = np.asarray(sc["rays"][batch["img_idxs"], batch["pix_idxs"]][..., :3])
target_depth = np.asarray(sc["label_depth"][batch["img_idxs"], batch["pix_idxs"]])
rays_o, rays_d = trainer._assemble_rays(trainer.state.params, batch, sc)
rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
rgb, depth, nrm, sem = _trace_room(rays_o, rays_d, 0.4)
err_rgb = np.abs(rgb - target_rgb).max(-1)
err_d = np.abs(depth - target_depth)
print(f"(a) trainer-path: rgb err mean={err_rgb.mean():.5f} "
      f"max={err_rgb.max():.5f} frac>0.05: {(err_rgb > 0.05).mean():.4f}")
print(f"    depth err mean={err_d.mean():.5f} max={err_d.max():.5f}")

# ---------------- (b) cross-view consistency
K = scene.K
W, H = scene.img_wh
poses = scene.poses
n_bad = n_tot = 0
rng = np.random.default_rng(0)
for i, j in [(0, 1), (2, 9), (5, 13), (3, 8)]:
    d_i = scene.labels["depth"][i]
    dirs = scene.directions
    sel = rng.integers(0, W * H, 4000)
    X = poses[i][:, 3][None] + d_i[sel, None] * (dirs[sel] @ poses[i][:, :3].T)
    # project into camera j: x_cam = R^T (X - t)
    Rj, tj = poses[j][:, :3], poses[j][:, 3]
    Xc = (X - tj[None]) @ Rj
    with np.errstate(divide="ignore", invalid="ignore"):
        u = Xc[:, 0] / Xc[:, 2] * K[0, 0] + K[0, 2] - 0.5
        v = Xc[:, 1] / Xc[:, 2] * K[1, 1] + K[1, 2] - 0.5
    ui, vi = np.round(u).astype(int), np.round(v).astype(int)
    ok = (Xc[:, 2] > 0.01) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    # occlusion check: j's depth at that pixel must match |Xc|
    pix_j = vi.clip(0, H - 1) * W + ui.clip(0, W - 1)
    dj = scene.labels["depth"][j][pix_j]
    dist_j = Xc[:, 2]   # depth convention: t along unnormalized (z=1) dirs
    vis = ok & (np.abs(dj - dist_j) < 0.01)
    ci = scene.rays[i][sel, :3]
    cj = scene.rays[j][pix_j, :3]
    err = np.abs(ci - cj).max(-1)
    # exclude checker-edge pixels (sub-pixel rounding flips the tile)
    bad = vis & (err > 0.3)
    n_bad += int(bad.sum())
    n_tot += int(vis.sum())
    print(f"(b) {i}->{j}: vis={vis.sum()} color-mismatch>0.3: {bad.sum()} "
          f"({bad.sum() / max(vis.sum(), 1):.3%})")
print(f"(b) total mismatch rate: {n_bad}/{n_tot}")
