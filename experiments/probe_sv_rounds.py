#!/usr/bin/env python
"""Trace sv test rounds for one ray: cursor progression + samples."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import (
    march_rays_test_round_dense, march_rays_test_round_sv,
)

G, SCALE, MAX_S = 128, 0.5, 1024
R = int(os.environ.get("RAY", 39))

rng = np.random.default_rng(0)
occ = rng.random((G, G, G)) > 0.995
w = G // 8
occ[:w] = occ[-w:] = True
occ[:, :w] = occ[:, -w:] = True
occ[:, :, :w] = occ[:, :, -w:] = True
flat_occ = occ.transpose(2, 1, 0).reshape(-1)
bitfield = packbits(jnp.asarray(flat_occ.astype(np.float32)), 0.5)
sv_mask, sv_payload = supervoxel_tables(bitfield, G)

N = 512
rays_o_all = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
d_all = rng.standard_normal((N, 3)).astype(np.float32)
d_all /= np.linalg.norm(d_all, axis=-1, keepdims=True)
hits = np.asarray(ray_aabb_intersect(
    jnp.asarray(rays_o_all), jnp.asarray(d_all), jnp.zeros(3),
    jnp.full(3, SCALE)))

ro = jnp.asarray(rays_o_all[R:R + 1])
rd = jnp.asarray(d_all[R:R + 1])
t1, t2 = hits[R]
cursor_s = jnp.asarray([t1 if t1 >= 0 else -1.0], jnp.float32)
cursor_d = cursor_s
t2j = jnp.asarray([t2], jnp.float32)
alive = jnp.asarray([True])
lo = np.sqrt(3.0) / MAX_S

all_s, all_d = [], []
for rnd in range(24):
    t_k, dt_k, v_k, new_cur = march_rays_test_round_sv(
        ro, rd, cursor_s, t2j, alive, sv_mask, sv_payload,
        scale=SCALE, grid_size=G, max_samples=MAX_S, n_steps=32)
    got = np.asarray(t_k)[0][np.asarray(v_k)[0]]
    print(f"sv rnd {rnd}: cur {float(cursor_s[0]):.6f} -> "
          f"{float(new_cur[0]):.6f} n={len(got)} "
          f"range=[{got.min() if len(got) else 0:.6f},"
          f"{got.max() if len(got) else 0:.6f}]")
    all_s.extend(got.tolist())
    cursor_s = new_cur
    if float(new_cur[0]) >= t2:
        break
for rnd in range(24):
    tg, dtg, val, new_cur = march_rays_test_round_dense(
        ro, rd, cursor_d, t2j, alive, bitfield, cascades=1, scale=SCALE,
        exp_step_factor=0.0, grid_size=G, max_samples=MAX_S, n_steps=128)
    got = np.asarray(tg)[0][np.asarray(val)[0]]
    all_d.extend(got.tolist())
    cursor_d = new_cur
    if float(new_cur[0]) >= t2:
        break

a, b = np.sort(all_d), np.sort(all_s)
print(f"dense n={len(a)} sv n={len(b)}")
only_d = sorted(set(np.round(a, 6)) - set(np.round(b, 6)))
only_s = sorted(set(np.round(b, 6)) - set(np.round(a, 6)))
print("only dense:", only_d[:8])
print("only sv   :", only_s[:8])
