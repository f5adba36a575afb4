"""bfloat16 compute-path validation (SURVEY.md §7 'AMP parity').

The reference trains under Lightning precision=16 with fp32 casts at
kernel boundaries (reference: models/custom_functions.py:27,78); the
TPU analogue is bfloat16 matmul compute with fp32 parameters, fp32
sigma/compositing, and fp32 gradient accumulation. These tests pin
(a) forward parity between compute dtypes within bf16 tolerance and
(b) that full training still learns under bf16 compute.
"""
import dataclasses

import jax
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models import NGPMT


def _mk(dtype, layout="brick"):
    return ModelConfig(
        scale=0.5, grid_size=16, max_samples=64,
        n_levels=4, base_resolution=4, hash_layout=layout,
        plane_res=33, grid3d_res=9,
        pred_norm_nn=True, pred_sem=True, n_sem_cls=3,
        compute_dtype=dtype,
    )


def test_bf16_forward_parity(rng):
    for layout in ("brick", "triplane"):
        m32 = NGPMT(_mk("float32", layout))
        m16 = NGPMT(_mk("bfloat16", layout))
        params = m32.init(jax.random.PRNGKey(0))
        # realistic magnitude tables (init is +-1e-4, below bf16 noise)
        params["hash_table"] = jax.tree_util.tree_map(
            lambda p: p * 100.0, params["hash_table"])
        x = jax.numpy.asarray(
            rng.uniform(-0.45, 0.45, (128, 3)).astype(np.float32))
        d = rng.standard_normal((128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jax.numpy.asarray(d)
        o32 = m32(params, x, d)
        o16 = m16(params, x, d)
        for k in o32:
            a, b = np.asarray(o32[k], np.float32), np.asarray(o16[k], np.float32)
            assert b.dtype == np.float32  # outputs always come back fp32
            if k == "sigmas":
                # exp() amplifies the bf16 mantissa error of its input
                # exponentially; compare pre-activation (log) instead —
                # matching how AMP parity is meaningfully defined
                a, b = np.log(np.maximum(a, 1e-6)), np.log(np.maximum(b, 1e-6))
            scale = np.maximum(np.abs(a), 1.0)
            err = np.max(np.abs(a - b) / scale)
            assert err < 0.05, (layout, k, err)


def test_bf16_training_learns(rng):
    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, OptimConfig, RenderConfig, TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

    cfg = TrainConfig(
        model=dataclasses.replace(_mk("bfloat16"), pred_norm_depth=True),
        render=RenderConfig(march_block=64, sample_budget=4096,
                            test_n_samples=16),
        loss=LossConfig(opacity_w=1e-3, sem_w=0.04, cluster_K=8,
                        cluster_niter=4),
        data=DataConfig(batch_size=192,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=60, lr=1e-2,
                          warmup_steps=16),
    )
    scene = SyntheticDataset(split="train", img_wh=(32, 32), n_images=6).load()
    tr = Trainer(cfg, scene)
    tr.mark_invisible_cells()
    psnrs = []
    for step in range(60):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(0), step)
            occ = tr._occ_update[step < cfg.optim.warmup_steps](
                tr.state.occ, tr.state.params, k)
            tr.state = tr.state._replace(occ=occ)
        tr.state, m = tr._train_step(tr.state, tr.scene_dev)
        psnrs.append(float(m["psnr"]))
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.0, (
        f"bf16 PSNR did not improve: {psnrs[:5]} ... {psnrs[-5:]}")
