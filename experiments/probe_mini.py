#!/usr/bin/env python
"""CPU mini-repro of the render_train quality plateau: tiny config,
one-image overfit with GT occupancy, dumps rendered/GT/depth images and
diagnostic stats so the degenerate state is visible.

Run: JAX_PLATFORMS=cpu python experiments/probe_mini.py
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

ROOM, SCALE = 0.4, 0.5
G = int(os.environ.get("G", 64))
MAX_S = int(os.environ.get("MAX_S", 512))
K = int(os.environ.get("K", 48))
ITERS = int(os.environ.get("ITERS", 600))
WH = int(os.environ.get("WH", 64))
BATCH = int(os.environ.get("BATCH", 2048))
TAILK = int(os.environ.get("TAILK", -1))
NOISE = float(os.environ.get("NOISE", 1))
LR = float(os.environ.get("LR", 1e-2))
# >0: bypass the learned density with a constant sigma on every marched
# sample (all samples lie in GT-occupied cells) — color-only learning
FIXSIGMA = float(os.environ.get("FIXSIGMA", 0))


def psnr(mse):
    return -10 * np.log10(max(float(mse), 1e-12))


def main():
    scene = SyntheticDataset(split="train", img_wh=(WH, WH), n_images=1).load()
    cell = (np.arange(G) + 0.5) / G * 2 * SCALE - SCALE
    zz, yy, xx = np.meshgrid(cell, cell, cell, indexing="ij")
    a = np.abs(np.stack([xx, yy, zz], -1)).max(-1)
    occ = (a >= ROOM - 0.01 - 2 * SCALE / G) & (a <= ROOM + 0.01 + 2 * SCALE / G)
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.float32)), 0.5)

    mcfg = ModelConfig(scale=SCALE, grid_size=G, max_samples=MAX_S,
                       rgb_use_dir=bool(int(os.environ.get("USE_DIR", 0))),
                       n_levels=8, log2_bricks=11, log2_hashmap_size=17,
                       hash_layout=os.environ.get("LAYOUT", "brick"))
    def _gt_color(x):
        """Analytic wall texture c(x) (same formula as the tracer)."""
        a = jnp.abs(x)
        ax = jnp.argmax(a, -1)
        sgn = jnp.take_along_axis(jnp.sign(x), ax[..., None], -1)[..., 0]
        from normal_clustering_nerf_tpu.datasets.synthetic import (
            _WALL_COLORS, _WALLS,
        )
        wall_id = jnp.zeros(x.shape[:-1], jnp.int32)
        for w, (axis, s) in enumerate(_WALLS):
            wall_id = jnp.where((ax == axis) & (sgn == s), w, wall_id)
        rgb = jnp.asarray(_WALL_COLORS)[wall_id]
        tex = (jnp.sin(2 * jnp.pi * 4 * x[..., 0])
               + jnp.sin(2 * jnp.pi * 4 * x[..., 1] + 0.7)
               + jnp.sin(2 * jnp.pi * 4 * x[..., 2] + 1.9)) / 3.0
        return rgb * (0.675 + 0.325 * tex[..., None])

    FIXCOLOR = bool(int(os.environ.get("FIXCOLOR", 0)))
    if FIXSIGMA > 0 or FIXCOLOR:
        class _Fixed(NGPMT):
            def __call__(self, params, x, d, **kw):
                out = super().__call__(params, x, d, **kw)
                if FIXSIGMA > 0:
                    out["sigmas"] = jnp.full_like(out["sigmas"], FIXSIGMA)
                if FIXCOLOR:
                    out["rgbs"] = _gt_color(x)
                return out
        model = _Fixed(mcfg)
    else:
        model = NGPMT(mcfg)
    params = {"m": model.init(jax.random.PRNGKey(0))}
    rcfg = RenderConfig(march_block=MAX_S, sample_budget=BATCH * K,
                        march_coarse=False, march_tail_k=TAILK,
                        bootstrap_steps=0, march_noise=NOISE,
                        random_bg=bool(int(os.environ.get("RANDOM_BG", 0))))
    clip = float(os.environ.get("CLIP", 0))
    sched = bool(int(os.environ.get("SCHED", 0)))
    lr = (optax.cosine_decay_schedule(LR, ITERS, alpha=1.0 / 30.0)
          if sched else LR)
    txs = [optax.clip_by_global_norm(clip)] if clip > 0 else []
    tx = optax.chain(*txs, optax.adam(lr, eps=1e-15))
    opt = tx.init(params)

    dirs = jnp.asarray(scene.directions)
    pose = jnp.asarray(scene.poses[0])
    rays = jnp.asarray(scene.rays[0, :, :3])
    depth_gt = np.asarray(scene.labels["depth"][0])
    n_px = rays.shape[0]

    @jax.jit
    def step(params, opt, key):
        k_pix, k_r = jax.random.split(key)
        pix = jax.random.randint(k_pix, (BATCH,), 0, n_px)
        d = dirs[pix] @ pose[:, :3].T
        o = jnp.broadcast_to(pose[:, 3], d.shape)
        tgt = rays[pix]

        def loss_fn(p):
            res = render_train(model, p["m"], bitfield, o, d, k_r, rcfg,
                               global_step=10 ** 6)
            mse = jnp.mean((res["rgb"] - tgt) ** 2)
            l = mse
            ow = float(os.environ.get("OPACITY_W", 0))
            if ow > 0:
                op = jnp.clip(res["opacity"], 1e-6, 1 - 1e-6)
                l = l + ow * jnp.mean(-op * jnp.log(op))
            return l, (mse, jnp.mean(res["opacity"]))

        (_, (mse, op)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, mse, op

    key = jax.random.PRNGKey(1)
    for it in range(ITERS + 1):
        key, k = jax.random.split(key)
        params, opt, mse, op = step(params, opt, k)
        if it % max(ITERS // 12, 1) == 0:
            print(f"it {it}: psnr {psnr(mse):.2f} opacity {float(op):.3f}",
                  flush=True)

    # full-image eval + diagnostics
    d_full = dirs @ pose[:, :3].T
    o_full = jnp.broadcast_to(pose[:, 3], d_full.shape)
    rc_eval = RenderConfig(march_block=MAX_S, sample_budget=n_px * K,
                           march_coarse=False, march_tail_k=TAILK,
                           bootstrap_steps=0, march_noise=0.0)
    res = jax.jit(lambda p: render_train(
        model, p, bitfield, o_full, d_full, jax.random.PRNGKey(9), rc_eval,
        global_step=10 ** 6))(params["m"])
    rgb = np.asarray(res["rgb"]).reshape(WH, WH, 3)
    gt = np.asarray(rays).reshape(WH, WH, 3)
    depth = np.asarray(res["depth"]).reshape(WH, WH)
    opac = np.asarray(res["opacity"]).reshape(WH, WH)
    rcount = np.asarray(res["ray_count"]).reshape(WH, WH)
    mse_im = float(np.mean((rgb - gt) ** 2))
    print(f"full-image psnr {psnr(mse_im):.2f}  opacity mean "
          f"{opac.mean():.3f} min {opac.min():.3f}", flush=True)
    dgt = depth_gt.reshape(WH, WH)
    print("depth err quantiles:", np.percentile(np.abs(depth - dgt),
                                                [10, 50, 90]).round(4))
    print("ray_count quantiles:", np.percentile(rcount, [10, 50, 90]))
    # worst rows/cols tell whether the failure is spatial (edges?) or global
    err = ((rgb - gt) ** 2).mean(-1)
    print(f"err center {err[16:-16, 16:-16].mean():.5f} "
          f"border {np.concatenate([err[:8].ravel(), err[-8:].ravel(), err[:, :8].ravel(), err[:, -8:].ravel()]).mean():.5f}")

    print(f"pred float channel-std {rgb.std(-1).mean():.6f}  "
          f"pred mean {rgb.reshape(-1,3).mean(0)}")
    # is the FIELD color gray? eval c(x) on wall points directly
    wall_x = jnp.asarray(np.stack([
        np.full(64, ROOM - 0.004), np.linspace(-0.3, 0.3, 64),
        np.linspace(-0.3, 0.3, 64)], -1).astype(np.float32))
    fo = model(params["m"], wall_x, jnp.ones_like(wall_x))
    fr = np.asarray(fo["rgbs"])
    print(f"field c(x) on +x wall: mean {fr.mean(0)} channel-std "
          f"{fr.std(-1).mean():.5f}  sigma mean {np.asarray(fo['sigmas']).mean():.1f}")

    outdir = os.environ.get("OUT", "/tmp/probe_mini")
    os.makedirs(outdir, exist_ok=True)
    np.savez(f"{outdir}/dump.npz", rgb=rgb, gt=gt, depth=depth, opac=opac,
             depth_gt=dgt)
    import pickle
    with open(f"{outdir}/params.pkl", "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    try:
        from PIL import Image
        for name, im in (("pred", rgb), ("gt", gt)):
            Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(
                f"{outdir}/{name}.png")
        dv = np.clip(depth / max(dgt.max(), 1e-6), 0, 1)
        Image.fromarray((dv * 255).astype(np.uint8)).save(f"{outdir}/depth.png")
        Image.fromarray((np.clip(dgt / dgt.max(), 0, 1) * 255).astype(np.uint8)
                        ).save(f"{outdir}/depth_gt.png")
        Image.fromarray((opac * 255).astype(np.uint8)).save(f"{outdir}/opacity.png")
        print(f"images -> {outdir}", flush=True)
    except ImportError:
        np.savez(f"{outdir}/dump.npz", rgb=rgb, gt=gt, depth=depth, opac=opac)
        print(f"npz -> {outdir}", flush=True)


if __name__ == "__main__":
    main()
