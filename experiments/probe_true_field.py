#!/usr/bin/env python
"""Render the analytically TRUE field through our march+composite —
no SGD. If this reproduces the GT images at high PSNR, the renderer is
expressive and unbiased; if not, the render path itself has a bias that
view-dependent color must be absorbing during training."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.datasets.synthetic import (
    SyntheticDataset, _WALL_COLORS, _WALLS,
)
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import (
    march_rays_train_dense,
)
from normal_clustering_nerf_tpu.ops.composite import composite_rays

ROOM = 0.4
G, SCALE, MAX_S = 128, 0.5, 1024
SHELL = float(os.environ.get("PROBE_SHELL", 0.01))   # wall shell thickness
SIGMA = float(os.environ.get("SIGMA", 5000.0))
K = int(os.environ.get("K", 64))


def field(xyz):
    """sigma, rgb of the true room: opaque thin shell at the walls."""
    a = np.abs(np.asarray(xyz))
    inside_shell = (a.max(-1) >= ROOM - SHELL) & (a.max(-1) <= ROOM + SHELL)
    sig = np.where(inside_shell, SIGMA, 0.0).astype(np.float32)
    # which wall: the axis with max |coord|, sign
    ax = np.argmax(a, -1)
    sgn = np.take_along_axis(np.sign(xyz), ax[..., None], -1)[..., 0]
    wall_id = np.zeros(xyz.shape[:-1], np.int64)
    for w, (axis, s) in enumerate(_WALLS):
        wall_id = np.where((ax == axis) & (sgn == s), w, wall_id)
    rgb = _WALL_COLORS[wall_id]
    p = np.asarray(xyz)
    tex = (np.sin(2 * np.pi * 4 * p[..., 0])
           + np.sin(2 * np.pi * 4 * p[..., 1] + 0.7)
           + np.sin(2 * np.pi * 4 * p[..., 2] + 1.9)) / 3.0
    rgb = rgb * (0.675 + 0.325 * tex[..., None])
    return sig, rgb.astype(np.float32)


def main():
    scene = SyntheticDataset(split="train", img_wh=(128, 128),
                             n_images=4).load()
    # occupancy: exactly the shell cells
    cell = (np.arange(G) + 0.5) / G * 2 * SCALE - SCALE
    zz, yy, xx = np.meshgrid(cell, cell, cell, indexing="ij")
    a = np.stack([xx, yy, zz], -1)
    occ = (np.abs(a).max(-1) >= ROOM - SHELL - 2 * SCALE / G) & \
          (np.abs(a).max(-1) <= ROOM + SHELL + 2 * SCALE / G)  # [z,y,x]
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.float32)), 0.5)

    W, H = scene.img_wh
    for i in range(2):
        ro = np.broadcast_to(scene.poses[i][:, 3],
                             scene.directions.shape).astype(np.float32)
        rd = (scene.directions @ scene.poses[i][:, :3].T).astype(np.float32)
        hits = ray_aabb_intersect(jnp.asarray(ro), jnp.asarray(rd),
                                  jnp.zeros(3), jnp.full(3, SCALE))
        mr = march_rays_train_dense(
            jnp.asarray(ro), jnp.asarray(rd), hits, bitfield,
            jnp.full(ro.shape[0], 0.5), cascades=1, scale=SCALE,
            exp_step_factor=0.0, grid_size=G, max_samples=MAX_S,
            samples_per_ray=K, tail_k=0)
        xyz = ro[:, None, :] + np.asarray(mr.t)[..., None] * rd[:, None, :]
        sig, rgb = field(xyz)
        comp = composite_rays(jnp.asarray(sig), jnp.asarray(rgb),
                              mr.dt, mr.t, mr.valid, 1e-4)
        pred = np.asarray(comp["rend"]) + 1.0 * (
            1.0 - np.asarray(comp["opacity"])[:, None])
        gt = scene.rays[i, :, :3]
        mse = np.mean((pred - gt) ** 2)
        d = np.asarray(comp["depth"])
        dg = scene.labels["depth"][i]
        print(f"view {i}: psnr={-10 * np.log10(mse):.2f} "
              f"opacity={np.asarray(comp['opacity']).mean():.4f} "
              f"depth_rmse={np.sqrt(np.mean((d - dg) ** 2)):.4f} "
              f"rm/ray={np.asarray(mr.ray_count).mean():.1f}")


if __name__ == "__main__":
    main()
