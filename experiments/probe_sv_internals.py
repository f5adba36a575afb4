#!/usr/bin/env python
"""Call _sv_scan directly for ray 39 at the round-1 cursor and dump the
interval selection + phase-B gates around the missing samples."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops import ray_march as rm

G, SCALE, MAX_S = 128, 0.5, 1024
R = 39

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
t2 = np.float32(hits[R, 1])
lo = np.float32(np.sqrt(3.0) / MAX_S)

# exact round-1 cursor: round 0 output (ceil of scan_end onto lattice)
t_k, dt_k, v_k, cur1 = rm.march_rays_test_round_sv(
    ro, rd, jnp.asarray([np.float32(hits[R, 0])]), jnp.asarray([t2]),
    jnp.asarray([True]), sv_mask, sv_payload, scale=SCALE, grid_size=G,
    max_samples=MAX_S, n_steps=32)
t0 = cur1  # (1,)
print("round-1 cursor:", repr(np.asarray(t0)[0]))

# --- replicate _sv_scan internals in jax, printing the gates ---
Gc = G // 8
mb = min(0.5, SCALE)
sv = 2.0 * mb / Gc
SI = int(sv * np.sqrt(3.0) / float(lo)) + 3
RI = 8
K = 32
S = MAX_S
inf = jnp.float32(jnp.inf)
rays_o, rays_d = ro, rd
hit = jnp.asarray([True])
t_end = jnp.asarray([t2])

jj = jnp.arange(Gc + 1, dtype=jnp.float32)
denom = jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
tb = ((jj[None, None, :] * sv - mb) - rays_o[:, :, None]) / denom[:, :, None]
tb = tb.reshape(1, 3 * (Gc + 1))
t0c = t0[:, None]
tb = jnp.where((tb > t0c) & (tb < t_end[:, None]), tb, inf)
t0b = jnp.where(hit, t0, inf)[:, None]
teb = jnp.where(hit, t_end, inf)[:, None]
bounds = jnp.sort(jnp.concatenate([t0b, tb, teb], axis=1), axis=1)
b0, b1 = bounds[:, :-1], bounds[:, 1:]
tm = 0.5 * (b0 + b1)
iv_valid = jnp.isfinite(b1) & (b1 > b0 + 1e-9)
svc = []
for a in range(3):
    pos_a = rays_o[:, a:a + 1] + jnp.where(iv_valid, tm, 0.0) * rays_d[:, a:a + 1]
    svc.append(jnp.clip(jnp.floor((pos_a + mb) / sv), 0, Gc - 1).astype(jnp.int32))
sv_id = (svc[2] * Gc + svc[1]) * Gc + svc[0]
occ_iv = (sv_mask[sv_id] > 0) & iv_valid
sv_id_cmp = jnp.where(iv_valid, sv_id, -1)
occ_iv = occ_iv & ((sv_id_cmp != jnp.roll(sv_id_cmp, 1, axis=1))
                   | (jnp.arange(sv_id.shape[1]) == 0)[None, :])
iidx, ivalid = rm.select_first_k(occ_iv, min(RI, occ_iv.shape[1]))
ts_r = jnp.take_along_axis(b0, iidx, axis=1)
svid_r = jnp.take_along_axis(sv_id, iidx, axis=1)
print("selected iidx:", np.asarray(iidx)[0], "valid:", np.asarray(ivalid)[0])
print("ts_r:", np.asarray(ts_r)[0])
print("svid_r:", np.asarray(svid_r)[0],
      "(target sv (7,3,12) id =", (12 * 16 + 3) * 16 + 7, ")")

payload = sv_payload[svid_r].astype(jnp.float32)
szc = svid_r // (Gc * Gc)
syc = (svid_r // Gc) % Gc
sxc = svid_r % Gc
k0 = jnp.ceil((ts_r - t0[:, None]) / lo).astype(jnp.int32) - 1
print("k0:", np.asarray(k0)[0])
jloc = jnp.arange(SI, dtype=jnp.int32)
kk = k0[:, :, None] + jloc[None, None, :]
tt = t0[:, None, None] + kk.astype(jnp.float32) * lo
in_rng = ((kk >= 0) & (kk < S) & (tt < t_end[:, None, None])
          & ivalid[:, :, None])
own = in_rng
loc = []
for a, svc_sel in ((0, sxc), (1, syc), (2, szc)):
    pos_a = rays_o[:, a, None, None] + tt * rays_d[:, a, None, None]
    cell_a = jnp.clip(0.5 * (pos_a / mb + 1.0) * G, 0.0, G - 1.0
                      ).astype(jnp.int32)
    own = own & ((cell_a >> 3) == svc_sel[:, :, None])
    loc.append(cell_a - 8 * svc_sel[:, :, None])
lx, ly, lz = loc
L = (lz * 8 + ly) * 8 + lx
w_idx = L >> 4
b_idx = (L & 15).astype(jnp.float32)
lanes = jnp.arange(32, dtype=jnp.int32)
onehot = (w_idx[..., None] == lanes).astype(jnp.float32)
word = jnp.sum(payload[:, :, None, :] * onehot, axis=-1)
bit = jnp.floor(word * jnp.exp2(-b_idx)) % 2.0
include = (bit > 0.5) & own

ttn = np.asarray(tt)[0]
incn = np.asarray(include)[0]
ownn = np.asarray(own)[0]
bitn = np.asarray(bit)[0]
for i in range(RI):
    for j in range(SI):
        if 0.515 < ttn[i, j] < 0.524:
            print(f"iv_slot{i} j={j} tt={ttn[i, j]:.6f} own={ownn[i, j]} "
                  f"bit={bitn[i, j]} inc={incn[i, j]}")
