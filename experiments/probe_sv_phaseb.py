#!/usr/bin/env python
"""Replicate _sv_scan phases A+B in numpy float32 for one ray and one
cursor value; report each gating condition for target lattice steps."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits

G, SCALE, MAX_S = 128, 0.5, 1024
R = 39
T0_OVERRIDE = os.environ.get("T0", "")

rng = np.random.default_rng(0)
occ = rng.random((G, G, G)) > 0.995
w = G // 8
occ[:w] = occ[-w:] = True
occ[:, :w] = occ[:, -w:] = True
occ[:, :, :w] = occ[:, :, -w:] = True
flat_occ = occ.transpose(2, 1, 0).reshape(-1)
bitfield = packbits(jnp.asarray(flat_occ.astype(np.float32)), 0.5)
sv_mask, sv_payload = supervoxel_tables(bitfield, G)
sv_mask = np.asarray(sv_mask)
sv_payload = np.asarray(sv_payload)

N = 512
rays_o_all = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
d_all = rng.standard_normal((N, 3)).astype(np.float32)
d_all /= np.linalg.norm(d_all, axis=-1, keepdims=True)
hits = np.asarray(ray_aabb_intersect(
    jnp.asarray(rays_o_all), jnp.asarray(d_all), jnp.zeros(3),
    jnp.full(3, SCALE)))

o = rays_o_all[R]
dd = d_all[R]
t2 = np.float32(hits[R, 1])
lo = np.float32(np.sqrt(3.0) / MAX_S)
Gc = G // 8
mb = np.float32(0.5)
sv = np.float32(2 * 0.5 / Gc)
SI = int(float(sv) * np.sqrt(3.0) / float(lo)) + 3
RI = 8
K = 32

t0 = np.float32(float(T0_OVERRIDE)) if T0_OVERRIDE else np.float32(0.338291)
t_end = t2
print(f"t0={t0!r} t_end={t_end!r} SI={SI}")

# phase A
jj = np.arange(Gc + 1, dtype=np.float32)
denom = np.where(np.abs(dd) < 1e-9, 1e-9, dd).astype(np.float32)
tb = (((jj[None, :] * sv - mb) - o[:, None]) / denom[:, None]).astype(np.float32)
tb = tb.reshape(-1)
tb = np.where((tb > t0) & (tb < t_end), tb, np.inf).astype(np.float32)
bounds = np.sort(np.concatenate([[t0], tb, [t_end]])).astype(np.float32)
b0, b1 = bounds[:-1], bounds[1:]
tm = (np.float32(0.5) * (b0 + b1)).astype(np.float32)
iv_valid = np.isfinite(b1) & (b1 > b0 + np.float32(1e-9))
svc_all = []
for a in range(3):
    pos_a = (o[a] + np.where(iv_valid, tm, np.float32(0.0)) * dd[a]).astype(np.float32)
    svc_all.append(np.clip(np.floor((pos_a + mb) / sv), 0, Gc - 1).astype(np.int32))
sv_id = (svc_all[2] * Gc + svc_all[1]) * Gc + svc_all[0]
occ_iv = (sv_mask[sv_id] > 0) & iv_valid
sv_id_cmp = np.where(iv_valid, sv_id, -1)
first = np.arange(len(sv_id)) == 0
occ_iv = occ_iv & ((sv_id_cmp != np.roll(sv_id_cmp, 1)) | first)

occ_pos = np.where(occ_iv)[0][:RI]
print("selected intervals:")
for j, i in enumerate(occ_pos):
    print(f"  #{j} iv{i} [{b0[i]:.6f},{b1[i]:.6f}] sv=({svc_all[0][i]},"
          f"{svc_all[1][i]},{svc_all[2][i]}) "
          f"k0={int(np.ceil((b0[i]-t0)/lo))-1}")

# phase B for the interval containing t~0.5176
target_k_global = [306, 307, 308, 309]
for i in occ_pos:
    ts_r = b0[i]
    k0 = int(np.ceil(np.float32(ts_r - t0) / lo)) - 1
    for j in range(SI):
        kk = k0 + j
        tt = np.float32(t0 + np.float32(np.float32(kk) * lo))
        if not (0.515 < float(tt) < 0.524):
            continue
        in_rng = (kk >= 0) and (kk < MAX_S) and (tt < t_end)
        cells, own = [], True
        for a, svc_sel in ((0, svc_all[0][i]), (1, svc_all[1][i]),
                           (2, svc_all[2][i])):
            pos_a = np.float32(o[a] + tt * dd[a])
            cell_a = np.int32(np.clip(np.float32(0.5) * (pos_a / mb + np.float32(1.0)) * G,
                                      0.0, G - 1.0))
            cells.append(int(cell_a))
            own = own and ((cell_a >> 3) == svc_sel)
        lx, ly, lz = (cells[0] - 8 * int(svc_all[0][i]),
                      cells[1] - 8 * int(svc_all[1][i]),
                      cells[2] - 8 * int(svc_all[2][i]))
        L = (lz * 8 + ly) * 8 + lx
        if own:
            widx, bidx = L >> 4, L & 15
            word = float(sv_payload[sv_id[i], widx])
            bit = np.floor(word * 2.0 ** (-bidx)) % 2.0
        else:
            bit = None
        print(f"iv{i} j={j} kk={kk} tt={float(tt):.6f} in_rng={in_rng} "
              f"cells={cells} own={own} L={L} bit={bit} occ={occ[tuple(cells)]}")
