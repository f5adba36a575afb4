#!/usr/bin/env python
"""Round-3 probe: bucket vs flat vs sv inference parity at production
scale (VERDICT weak #3: 2 dB disagreement at G=128 / 16k-ray chunks
while the parity test only covered G=16 toys).

All three layouts enumerate the same sample lattice, so per-ray outputs
must agree to float tolerance. This probe renders an adversarial foggy
field (scaled random params -> large sigmas, early termination) at the
bench shape and reports the max/mean per-ray divergence per layout pair.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
    from normal_clustering_nerf_tpu.datasets.ray_utils import (
        get_ray_directions, get_rays,
    )
    from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
    from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
    from normal_clustering_nerf_tpu.models.rendering import render_test
    from normal_clustering_nerf_tpu.ops.packbits import packbits

    G = int(os.environ.get("PROBE_G", 128))
    N = int(os.environ.get("PROBE_N", 16384))
    sigma_scale = float(os.environ.get("PROBE_SIGMA_SCALE", 8.0))

    mcfg = ModelConfig(scale=0.5, grid_size=G, max_samples=1024,
                       pred_norm_nn=True, pred_sem=True, n_sem_cls=3,
                       hidden_dim=16)
    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(3))
    # fog: scale sigma-head weights so trunc_exp outputs real densities
    params["sigma_net"]["w1"] = params["sigma_net"]["w1"] * sigma_scale

    # trained-room-like occupancy: occupied shell near walls + clutter
    rng = np.random.default_rng(0)
    occ = rng.random((G, G, G)) > 0.995
    w = G // 8
    occ[:w] = occ[-w:] = True
    occ[:, :w] = occ[:, -w:] = True
    occ[:, :, :w] = occ[:, :, -w:] = True
    flat_occ = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat_occ.astype(np.float32)), 0.5)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)

    # camera inside the room, bench-like intrinsics
    W_img = int(np.sqrt(N))
    K = np.array([[0.8 * W_img, 0, W_img / 2],
                  [0, 0.8 * W_img, W_img / 2], [0, 0, 1]], np.float32)
    dirs = get_ray_directions(W_img, W_img, K)
    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0.05], [0, 1, 0, -0.03], [0, 0, 1, 0.02]], np.float32))
    rays_o, rays_d = get_rays(jnp.asarray(dirs), pose)
    rays_o, rays_d = rays_o[:N], rays_d[:N]

    outs = {}
    for layout, use_sv in (("flat", False), ("bucket", False),
                           ("bucket_sv", True)):
        rcfg = RenderConfig(test_layout=layout.split("_")[0],
                            march_coarse=use_sv)
        t0 = time.time()
        res = render_test(model, params, bitfield, rays_o, rays_d, rcfg,
                          sv_mask=sv_mask if use_sv else None,
                          sv_payload=sv_payload if use_sv else None)
        outs[layout] = {k: np.asarray(v) for k, v in res.items()
                        if k in ("rgb", "depth", "opacity")}
        print(f"{layout:10s} {time.time() - t0:6.1f}s "
              f"opacity_mean={outs[layout]['opacity'].mean():.4f}",
              flush=True)

    ok = True
    for a, b in (("flat", "bucket"), ("flat", "bucket_sv")):
        for k in ("rgb", "depth", "opacity"):
            d = np.abs(outs[a][k] - outs[b][k])
            bad = int((d > 1e-3).sum())
            print(f"{a} vs {b} {k:8s} max={d.max():.3e} mean={d.mean():.3e} "
                  f"n>1e-3: {bad}", flush=True)
            if d.max() > 5e-3:
                ok = False
                # locate worst ray for debugging
                i = int(np.argmax(d.reshape(d.shape[0], -1).max(-1)))
                print(f"  worst ray {i}: {a}={outs[a][k][i]}, "
                      f"{b}={outs[b][k][i]}")
    print("PARITY OK" if ok else "PARITY FAIL")


if __name__ == "__main__":
    main()
