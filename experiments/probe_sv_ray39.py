#!/usr/bin/env python
"""Numpy replication of _sv_scan phase A/B for one divergent ray."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits

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
sv_mask_np = np.asarray(sv_mask)

N = 512
rays_o = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
d = rng.standard_normal((N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
hits = np.asarray(ray_aabb_intersect(
    jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, SCALE)))

o, dd = rays_o[R], d[R]
t1, t2 = hits[R]
lo = np.float32(np.sqrt(3.0) / MAX_S)
S = MAX_S
t0 = np.float32(t1)
t_end = np.float32(min(t2, t0 + S * lo))
Gc = G // 8
mb = np.float32(0.5)
sv = np.float32(2 * 0.5 / Gc)

jj = np.arange(Gc + 1, dtype=np.float32)
denom = np.where(np.abs(dd) < 1e-9, 1e-9, dd).astype(np.float32)
tb = ((jj[None, :] * sv - mb) - o[:, None]) / denom[:, None]   # (3, Gc+1)
tb = tb.reshape(-1)
tb = np.where((tb > t0) & (tb < t_end), tb, np.inf)
bounds = np.sort(np.concatenate([[t0], tb, [t_end]])).astype(np.float32)
b0, b1 = bounds[:-1], bounds[1:]
tm = (0.5 * (b0 + b1)).astype(np.float32)
iv_valid = np.isfinite(b1) & (b1 > b0 + 1e-9)

# target region of interest
t_lo, t_hi = float(os.environ.get("TLO", 0.51)), float(os.environ.get("THI", 0.53))
print(f"ray {R}: o={o} d={dd} t0={t0} t_end={t_end}")
for i in range(len(b0)):
    if not iv_valid[i]:
        continue
    if b1[i] < t_lo or b0[i] > t_hi:
        continue
    pos = o + tm[i] * dd
    svc = np.clip(np.floor((pos + mb) / sv), 0, Gc - 1).astype(np.int32)
    svid = (svc[2] * Gc + svc[1]) * Gc + svc[0]
    k0 = int(np.ceil((b0[i] - t0) / lo)) - 1
    print(f"iv {i}: [{b0[i]:.6f},{b1[i]:.6f}] len={b1[i]-b0[i]:.6f} "
          f"sv={svc} mask={sv_mask_np[svid]} k0={k0} "
          f"nsteps={(b1[i]-b0[i])/lo:.1f}")

# how many occupied intervals precede this region? (RI budget check)
occ_iv = []
for i in range(len(b0)):
    if not iv_valid[i]:
        continue
    pos = o + tm[i] * dd
    svc = np.clip(np.floor((pos + mb) / sv), 0, Gc - 1).astype(np.int32)
    svid = (svc[2] * Gc + svc[1]) * Gc + svc[0]
    if sv_mask_np[svid] > 0:
        occ_iv.append((i, float(b0[i]), float(b1[i]), tuple(svc)))
print(f"total occupied intervals: {len(occ_iv)}")
for j, (i, a, b, svc) in enumerate(occ_iv):
    mark = " <-- region" if (b >= t_lo and a <= t_hi) else ""
    print(f"  occ#{j} iv{i} [{a:.6f},{b:.6f}] sv={svc}{mark}")
