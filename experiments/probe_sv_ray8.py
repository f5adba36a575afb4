#!/usr/bin/env python
"""Inspect one divergent ray: is the sv march's extra sample a real
occupied cell (dense march missed it) or phantom (sv bug)?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import (
    march_rays_train_dense, march_rays_train_dense_sv, t_step_grid,
)

G, SCALE, MAX_S = 128, 0.5, 1024

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
rays_o = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
d = rng.standard_normal((N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
noise = np.zeros(N, np.float32)
hits = ray_aabb_intersect(
    jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, SCALE))

K = 64
common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S, samples_per_ray=K)
exact = march_rays_train_dense(
    jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield, jnp.asarray(noise),
    cascades=1, exp_step_factor=0.0, **common)
svr = march_rays_train_dense_sv(
    jnp.asarray(rays_o), jnp.asarray(d), hits, sv_mask, sv_payload,
    jnp.asarray(noise), n_intervals=48, **common)

lo = np.sqrt(3.0) / MAX_S
for r in [8, 19, 39]:
    o, dd = rays_o[r], d[r]
    t1 = float(np.asarray(hits)[r, 0])
    e_t = np.asarray(exact.t)[r][np.asarray(exact.valid)[r]]
    s_t = np.asarray(svr.t)[r][np.asarray(svr.valid)[r]]
    only_sv = sorted(set(np.round(s_t, 7)) - set(np.round(e_t, 7)))
    only_ex = sorted(set(np.round(e_t, 7)) - set(np.round(s_t, 7)))
    print(f"ray {r}: t1={t1:.6f} only_sv={only_sv[:5]} only_ex={only_ex[:5]}")
    for t in (only_sv[:3] + only_ex[:3]):
        x = o + t * dd
        # dense-march cell (occupancy_lookup formula, float32)
        xf = x.astype(np.float32)
        cell_d = np.clip(0.5 * (xf / 0.5 + 1.0) * G, 0, G - 1).astype(np.int32)
        # sv-march cell (floor((pos+mb)/(2mb)*G))
        cell_s = np.clip(np.floor((xf + 0.5) / 1.0 * G), 0, G - 1).astype(np.int32)
        bit = occ[cell_d[0], cell_d[1], cell_d[2]]
        bit_s = occ[cell_s[0], cell_s[1], cell_s[2]]
        # lattice index of t on the ray's step grid
        k = (t - t1) / lo
        print(f"  t={t:.7f} k={k:.4f} cell_d={cell_d} occ={bit} "
              f"cell_s={cell_s} occ_s={bit_s}")
        # is t on the exact lattice? recompute dense lattice point k
        kk = int(np.round(k))
        tg = np.asarray(t_step_grid(jnp.asarray([t1], jnp.float32), kk + 2,
                                    exp_step_factor=0.0, max_samples=MAX_S,
                                    grid_size=G, scale=SCALE))[0]
        print(f"    lattice t[{kk}]={tg[kk]:.7f} (vs sample {t:.7f})")
