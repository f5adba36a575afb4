#!/usr/bin/env python
"""Bisect the sv-path divergence at G=128: (a) train sv march vs exact
dense march sample parity; (b) sv test-round loop vs dense test-round
loop sample parity on the same cursors."""
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
    march_rays_train_dense, march_rays_train_dense_sv,
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

# ---------- (a) train march parity, generous interval budget ----------
K = 64
common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S, samples_per_ray=K)
exact = march_rays_train_dense(
    jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield, jnp.asarray(noise),
    cascades=1, exp_step_factor=0.0, **common)
svr = march_rays_train_dense_sv(
    jnp.asarray(rays_o), jnp.asarray(d), hits, sv_mask, sv_payload,
    jnp.asarray(noise), n_intervals=48, **common)
e_c, s_c = np.asarray(exact.ray_count), np.asarray(svr.ray_count)
bad = np.where(e_c != s_c)[0]
print(f"(a) train-march: count mismatches {len(bad)}/{N}  trunc={int(svr.trunc_rays)}")
e_v, s_v = np.asarray(exact.valid), np.asarray(svr.valid)
e_t, s_t = np.asarray(exact.t), np.asarray(svr.t)
n_tmis = 0
for r in range(N):
    if e_c[r] == s_c[r]:
        if not np.allclose(s_t[r][s_v[r]], e_t[r][e_v[r]], rtol=1e-6, atol=1e-7):
            n_tmis += 1
            if n_tmis <= 2:
                i = np.where(~np.isclose(s_t[r][s_v[r]], e_t[r][e_v[r]],
                                         rtol=1e-6, atol=1e-7))[0][0]
                print(f"  ray {r} t mismatch at {i}: sv={s_t[r][s_v[r]][i]:.6f} "
                      f"exact={e_t[r][e_v[r]][i]:.6f}")
print(f"(a) t-mismatches among equal-count rays: {n_tmis}")
for r in bad[:3]:
    a, b = e_t[r][e_v[r]], s_t[r][s_v[r]]
    print(f"  ray {r}: exact n={e_c[r]} sv n={s_c[r]}")
    miss = sorted(set(np.round(a / float(a[0] if len(a) else 1), 9)) -
                  set(np.round(b / float(a[0] if len(a) else 1), 9)))[:4] if len(a) else []
    print(f"    exact head {a[:6]}")
    print(f"    sv    head {b[:6]}")

# ---------- (b) test-round loop parity ----------
lo = np.sqrt(3.0) / MAX_S
t1 = np.asarray(hits)[:, 0]
t2 = np.asarray(hits)[:, 1]
cursor_d = jnp.asarray(np.where(t1 >= 0, t1, -1).astype(np.float32))
cursor_s = cursor_d
alive = jnp.asarray(t1 >= 0)
Kr = 32
samp_d = [[] for _ in range(N)]
samp_s = [[] for _ in range(N)]
for rnd in range(24):
    tg, dtg, val, cursor_d = march_rays_test_round_dense(
        jnp.asarray(rays_o), jnp.asarray(d), cursor_d, jnp.asarray(t2),
        alive, bitfield, cascades=1, scale=SCALE, exp_step_factor=0.0,
        grid_size=G, max_samples=MAX_S, n_steps=128)
    tgn, valn = np.asarray(tg), np.asarray(val)
    for r in range(N):
        samp_d[r].extend(tgn[r][valn[r]].tolist())
    t_k, dt_k, v_k, cursor_s = march_rays_test_round_sv(
        jnp.asarray(rays_o), jnp.asarray(d), cursor_s, jnp.asarray(t2),
        alive, sv_mask, sv_payload, scale=SCALE, grid_size=G,
        max_samples=MAX_S, n_steps=Kr)
    tkn, vkn = np.asarray(t_k), np.asarray(v_k)
    for r in range(N):
        samp_s[r].extend(tkn[r][vkn[r]].tolist())

nbad = 0
for r in range(N):
    a = np.sort(np.array(samp_d[r], np.float64))
    b = np.sort(np.array(samp_s[r], np.float64))
    # compare the common prefix (loops ran fixed rounds; horizons differ)
    m = min(len(a), len(b))
    # only flag when the ENUMERATED overlap disagrees
    if m and not np.allclose(a[:m], b[:m], rtol=1e-5, atol=1e-6):
        nbad += 1
        if nbad <= 3:
            i = np.where(~np.isclose(a[:m], b[:m], rtol=1e-5, atol=1e-6))[0][0]
            print(f"(b) ray {r}: dense n={len(a)} sv n={len(b)} first diff @{i}: "
                  f"dense={a[i]:.6f} sv={b[i]:.6f}")
            print(f"    dense around: {a[max(0,i-2):i+3]}")
            print(f"    sv    around: {b[max(0,i-2):i+3]}")
cov = [(len(samp_d[r]), len(samp_s[r])) for r in range(N)]
cd = sum(c[0] for c in cov); cs = sum(c[1] for c in cov)
print(f"(b) prefix mismatches: {nbad}/{N}; total samples dense={cd} sv={cs}")
