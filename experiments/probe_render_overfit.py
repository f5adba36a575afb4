#!/usr/bin/env python
"""Overfit ONE image through render_train with ground-truth occupancy.

The supervised-regression probe fits the wall texture to ~50 dB, while
the full trainer caps at ~23.7 dB even on one image — this bisects the
difference. Env knobs add trainer pieces back one at a time:
  CLIP=0.05      optax clip_by_global_norm before adam
  OPACITY_W=1e-3 opacity entropy loss
  TAILK=-1/0/8   stratified budget mode
  K=32           samples per ray
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.models.rendering import render_train
from normal_clustering_nerf_tpu.ops.packbits import packbits

ROOM, G, SCALE, MAX_S = 0.4, 128, 0.5, 1024
SHELL = 0.01
K = int(os.environ.get("K", 64))
CLIP = float(os.environ.get("CLIP", 0))
OPACITY_W = float(os.environ.get("OPACITY_W", 0))
TAILK = int(os.environ.get("TAILK", -1))
LAYOUT = os.environ.get("LAYOUT", "brick")
USE_DIR = bool(int(os.environ.get("USE_DIR", 0)))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    scene = SyntheticDataset(split="train", img_wh=(128, 128),
                             n_images=1).load()
    cell = (np.arange(G) + 0.5) / G * 2 * SCALE - SCALE
    zz, yy, xx = np.meshgrid(cell, cell, cell, indexing="ij")
    a = np.abs(np.stack([xx, yy, zz], -1)).max(-1)
    occ = (a >= ROOM - SHELL - 2 * SCALE / G) & (a <= ROOM + SHELL + 2 * SCALE / G)
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.float32)), 0.5)

    mcfg = ModelConfig(scale=SCALE, grid_size=G, max_samples=MAX_S,
                       hash_layout=LAYOUT, rgb_use_dir=USE_DIR)
    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    rcfg = RenderConfig(march_block=1024, sample_budget=8192 * K,
                        march_coarse=False, march_tail_k=TAILK,
                        bootstrap_steps=0)
    txs = [optax.clip_by_global_norm(CLIP)] if CLIP > 0 else []
    tx = optax.chain(*txs, optax.adam(1e-2, eps=1e-15))
    params = {"m": params}
    opt = tx.init(params)

    dirs = jnp.asarray(scene.directions)
    pose = jnp.asarray(scene.poses[0])
    rays = jnp.asarray(scene.rays[0, :, :3])
    n_px = rays.shape[0]

    @jax.jit
    def step(params, opt, key):
        k_pix, k_r = jax.random.split(key)
        pix = jax.random.randint(k_pix, (8192,), 0, n_px)
        d = dirs[pix] @ pose[:, :3].T
        o = jnp.broadcast_to(pose[:, 3], d.shape)
        tgt = rays[pix]

        def loss_fn(p):
            res = render_train(model, p["m"], bitfield, o, d, k_r, rcfg,
                               global_step=10 ** 6)
            l = jnp.mean((res["rgb"] - tgt) ** 2)
            if OPACITY_W > 0:
                op = res["opacity"] + 1e-10
                l = l + OPACITY_W * jnp.mean(-op * jnp.log(op))
            return l, jnp.mean((res["rgb"] - tgt) ** 2)

        (l, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, u)
        return params, opt, mse

    key = jax.random.PRNGKey(1)
    for it in range(1001):
        key, k = jax.random.split(key)
        params, opt, mse = step(params, opt, k)
        if it % 200 == 0:
            print(f"it {it}: mse={float(mse):.6f} "
                  f"psnr={-10 * np.log10(max(float(mse), 1e-12)):.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
