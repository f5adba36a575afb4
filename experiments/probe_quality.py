#!/usr/bin/env python
"""Quality-ceiling bisect: overfit ONE image via render_train with
ground-truth occupancy, then evaluate the SAME image through every
render path (jittered train, jitter-free train, flat test, bucket
test). Separates (a) jitter measurement noise, (b) a true train-path
ceiling, (c) a test-path defect, (d) optimizer noise floor.

Env knobs:
  ITERS=1000   training iterations
  LR=1e-2      adam lr
  SCHED=1      cosine-decay lr to LR/30 (reference: train_nerf.py:288)
  K=64         samples per ray
  TAILK=-1     stratified budget mode (-1 full / 0 first-K / k tail)
  NOISE=1      first-sample jitter amplitude
  CLIP=0       optax clip_by_global_norm
  OPACITY_W=0  opacity entropy loss weight
  LAYOUT=brick hash layout
  USE_DIR=0    rgb head sees view dir
  IMG_WH=128   image side
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.models.rendering import render_test, render_train
# OccupancyGrid unused: supervoxel tables built directly
from normal_clustering_nerf_tpu.ops.packbits import packbits

ROOM, G, SCALE, MAX_S = 0.4, 128, 0.5, 1024
SHELL = 0.01
K = int(os.environ.get("K", 64))
CLIP = float(os.environ.get("CLIP", 0))
OPACITY_W = float(os.environ.get("OPACITY_W", 0))
TAILK = int(os.environ.get("TAILK", -1))
LAYOUT = os.environ.get("LAYOUT", "brick")
USE_DIR = bool(int(os.environ.get("USE_DIR", 0)))
ITERS = int(os.environ.get("ITERS", 1000))
LR = float(os.environ.get("LR", 1e-2))
SCHED = bool(int(os.environ.get("SCHED", 1)))
NOISE = float(os.environ.get("NOISE", 1))
IMG_WH = int(os.environ.get("IMG_WH", 128))


def psnr(mse):
    return -10 * np.log10(max(float(mse), 1e-12))


def main():
    t0 = time.time()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    scene = SyntheticDataset(split="train", img_wh=(IMG_WH, IMG_WH),
                             n_images=1).load()
    cell = (np.arange(G) + 0.5) / G * 2 * SCALE - SCALE
    zz, yy, xx = np.meshgrid(cell, cell, cell, indexing="ij")
    a = np.abs(np.stack([xx, yy, zz], -1)).max(-1)
    occ = (a >= ROOM - SHELL - 2 * SCALE / G) & (a <= ROOM + SHELL + 2 * SCALE / G)
    occ_flat = jnp.asarray(occ.reshape(-1).astype(np.float32))
    bitfield = packbits(occ_flat, 0.5)

    mcfg = ModelConfig(scale=SCALE, grid_size=G, max_samples=MAX_S,
                       hash_layout=LAYOUT, rgb_use_dir=USE_DIR)
    # supervoxel tables for the sv/bucket test path
    from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)

    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    rcfg = RenderConfig(march_block=1024, sample_budget=8192 * K,
                        march_coarse=False, march_tail_k=TAILK,
                        bootstrap_steps=0, march_noise=NOISE)
    txs = [optax.clip_by_global_norm(CLIP)] if CLIP > 0 else []
    if SCHED:
        lr = optax.cosine_decay_schedule(LR, ITERS, alpha=1.0 / 30.0)
    else:
        lr = LR
    tx = optax.chain(*txs, optax.adam(lr, eps=1e-15))
    params = {"m": params}
    opt = tx.init(params)

    dirs = jnp.asarray(scene.directions)
    pose = jnp.asarray(scene.poses[0])
    rays = jnp.asarray(scene.rays[0, :, :3])
    depth_gt = jnp.asarray(scene.labels["depth"][0])
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
    for it in range(ITERS + 1):
        key, k = jax.random.split(key)
        params, opt, mse = step(params, opt, k)
        if it % max(ITERS // 5, 1) == 0:
            print(f"[{time.time()-t0:6.1f}s] it {it}: train-psnr(jitter) "
                  f"{psnr(mse):.2f}", flush=True)

    # ---- evaluation on the full image through each render path ----
    d_full = dirs @ pose[:, :3].T
    o_full = jnp.broadcast_to(pose[:, 3], d_full.shape)

    def eval_train(noise_amp, tag):
        rc = RenderConfig(march_block=1024, sample_budget=n_px * K,
                          march_coarse=False, march_tail_k=TAILK,
                          bootstrap_steps=0, march_noise=noise_amp)
        res = jax.jit(lambda p: render_train(
            model, p, bitfield, o_full, d_full, jax.random.PRNGKey(9), rc,
            global_step=10 ** 6))(params["m"])
        m = float(jnp.mean((res["rgb"] - rays) ** 2))
        derr = float(jnp.mean(jnp.abs(
            res["depth"] - depth_gt / jnp.linalg.norm(d_full, axis=-1) ** 0)))
        # depth in t-units of unnormalized d: compare to gt/|d| is wrong;
        # gt depth is along-ray metric t with |d| != 1 -> t_gt = gt/|d|... the
        # synthetic tracer returns t in the SAME unnormalized-d t-units, so
        # compare directly.
        derr = float(jnp.mean(jnp.abs(res["depth"] - depth_gt)))
        op = float(jnp.mean(res["opacity"]))
        print(f"  {tag}: psnr {psnr(m):.2f}  depth-L1 {derr:.4f}  "
              f"opacity {op:.4f}", flush=True)

    def eval_test(layout, tag):
        import dataclasses
        rc = RenderConfig(march_coarse=(layout == "bucket_sv"),
                          test_layout="bucket" if "bucket" in layout else "flat",
                          march_tail_k=TAILK)
        kw = {}
        if layout == "bucket_sv":
            kw = dict(sv_mask=sv_mask, sv_payload=sv_payload)
        res = render_test(model, params["m"], bitfield, o_full, d_full, rc, **kw)
        m = float(jnp.mean((res["rgb"] - rays) ** 2))
        derr = float(jnp.mean(jnp.abs(res["depth"] - depth_gt)))
        op = float(jnp.mean(res["opacity"]))
        print(f"  {tag}: psnr {psnr(m):.2f}  depth-L1 {derr:.4f}  "
              f"opacity {op:.4f}", flush=True)

    print(f"[{time.time()-t0:6.1f}s] === eval on train image ===", flush=True)
    eval_train(1.0, "train-render jitter=1")
    eval_train(0.0, "train-render jitter=0")
    eval_test("flat", "test-render flat     ")
    eval_test("bucket", "test-render bucket   ")
    eval_test("bucket_sv", "test-render bucket-sv")
    print(f"[{time.time()-t0:6.1f}s] done", flush=True)


if __name__ == "__main__":
    main()
