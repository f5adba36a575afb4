"""Dense-vs-flat train-render parity.

The dense (N, K) march layout (models/rendering.py fast path) must be
numerically equivalent to the flat compacted layout (the oracle path
validated sample-by-sample against the CUDA DDA transcription in
test_ray_march.py): same composited images, same losses, same grads.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
from normal_clustering_nerf_tpu.models import NGPMT
from normal_clustering_nerf_tpu.models.rendering import render_train
from normal_clustering_nerf_tpu.ops.distortion import (
    distortion_loss, distortion_loss_dense,
)
from normal_clustering_nerf_tpu.ops.packbits import packbits


def _setup(rng, *, pred_heads=True):
    cfg = ModelConfig(
        scale=0.5, grid_size=16, max_samples=128,
        n_levels=4, log2_hashmap_size=10,
        pred_norm_nn=pred_heads, pred_sem=pred_heads, n_sem_cls=3,
    )
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    G = cfg.grid_size
    occ = rng.random((G, G, G)) > 0.5
    occ[4:12, 4:12, 4:12] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    N = 24
    rays_o = rng.uniform(-1.2, 1.2, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return model, params, bitfield, jnp.asarray(rays_o), jnp.asarray(d)


def test_render_train_dense_matches_flat(rng):
    model, params, bitfield, rays_o, rays_d = _setup(rng)
    key = jax.random.PRNGKey(3)
    N = rays_o.shape[0]
    K = 16
    rc_dense = RenderConfig(march_layout="dense", march_block=128,
                            sample_budget=N * K)
    rc_flat = dataclasses.replace(rc_dense, march_layout="flat")

    out_d = render_train(model, params, bitfield, rays_o, rays_d, key, rc_dense)
    out_f = render_train(model, params, bitfield, rays_o, rays_d, key, rc_flat)

    for k in ("rgb", "opacity", "depth", "norm_nn", "sem"):
        np.testing.assert_allclose(
            np.asarray(out_d[k]), np.asarray(out_f[k]), rtol=2e-5, atol=2e-6,
            err_msg=k)
    assert int(out_d["rm_samples"]) == int(out_f["rm_samples"])
    assert int(out_d["vr_samples"]) == int(out_f["vr_samples"])
    np.testing.assert_array_equal(
        np.asarray(out_d["ray_count"]), np.asarray(out_f["ray_count"]))

    # distortion loss parity across layouts
    dl_dense = distortion_loss_dense(
        out_d["ws"], out_d["deltas"], out_d["ts"], out_d["sample_valid"])
    dl_flat = distortion_loss(
        out_f["ws"], out_f["deltas"], out_f["ts"], out_f["ray_id"],
        out_f["ray_start"], out_f["sample_valid"], N)
    np.testing.assert_allclose(
        np.asarray(dl_dense), np.asarray(dl_flat), rtol=2e-5, atol=1e-7)


def test_render_train_dense_grads_match_flat(rng):
    model, params, bitfield, rays_o, rays_d = _setup(rng, pred_heads=False)
    key = jax.random.PRNGKey(5)
    N = rays_o.shape[0]
    rc_dense = RenderConfig(march_layout="dense", march_block=128,
                            sample_budget=N * 8)
    rc_flat = dataclasses.replace(rc_dense, march_layout="flat")

    def loss(p, rc):
        out = render_train(model, p, bitfield, rays_o, rays_d, key, rc)
        return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"] ** 2)
                + jnp.sum(out["opacity"]))

    g_d = jax.grad(loss)(params, rc_dense)
    g_f = jax.grad(loss)(params, rc_flat)
    leaves_d = jax.tree_util.tree_leaves_with_path(g_d)
    leaves_f = jax.tree_util.tree_leaves(g_f)
    for (path, a), b in zip(leaves_d, leaves_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
