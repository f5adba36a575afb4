"""Bucket-vs-flat inference-render parity.

The alive-compacted bucket test renderer (models/rendering.py
`test_layout='bucket'`, the TPU analogue of the reference's dynamic
alive-ray compaction, reference: models/rendering.py:78-84) must
produce the same images as the full-batch masked-round oracle
(`test_layout='flat'`): both enumerate the same closed-form per-ray
step sequence, probe the same occupancy bits, and composite with the
same transmittance continuation — only the work scheduling differs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
from normal_clustering_nerf_tpu.models import NGPMT
from normal_clustering_nerf_tpu.models.rendering import render_test
from normal_clustering_nerf_tpu.ops.packbits import packbits


def _setup(rng, *, pred_heads=True, n_rays=37):
    cfg = ModelConfig(
        scale=0.5, grid_size=16, max_samples=128,
        n_levels=4, log2_hashmap_size=10,
        pred_norm_nn=pred_heads, pred_sem=pred_heads, n_sem_cls=3,
    )
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    G = cfg.grid_size
    occ = rng.random((G, G, G)) > 0.6
    occ[5:11, 5:11, 5:11] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    rays_o = rng.uniform(-1.2, 1.2, (n_rays, 3)).astype(np.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return model, params, bitfield, jnp.asarray(rays_o), jnp.asarray(d)


def test_render_test_bucket_matches_flat(rng):
    from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables

    model, params, bitfield, rays_o, rays_d = _setup(rng)
    rc_bucket = RenderConfig(test_layout="bucket", test_march_window=32,
                             test_n_samples=16)
    rc_flat = dataclasses.replace(rc_bucket, test_layout="flat")

    out_b = render_test(model, params, bitfield, rays_o, rays_d,
                        rc_bucket)
    out_f = render_test(model, params, bitfield, rays_o, rays_d,
                        rc_flat)
    sv_mask, sv_payload = supervoxel_tables(bitfield, model.cfg.grid_size)
    out_s = render_test(model, params, bitfield, rays_o, rays_d,
                        rc_bucket, sv_mask=sv_mask, sv_payload=sv_payload)

    for k in ("rgb", "opacity", "depth", "norm_nn", "sem"):
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_f[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_f[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"sv {k}")
    # all schedules must composite the same effective sample set
    assert int(out_b["total_samples"]) == int(out_f["total_samples"])
    assert int(out_s["total_samples"]) == int(out_f["total_samples"])


def test_render_test_bucket_converged_rays_stop(rng):
    """Rays that converge (or miss the AABB) stop consuming samples:
    the bucket path's total work must be well under the flat path's
    all-rays-every-round budget on a mostly-empty scene."""
    model, params, bitfield, rays_o, rays_d = _setup(rng, pred_heads=False,
                                                     n_rays=64)
    # point half the rays away from the box so they die in round 1
    rays_o = rays_o.at[:32].set(
        jnp.asarray([2.0, 2.0, 2.0]) + 0.01 * rays_o[:32])
    rays_d = rays_d.at[:32].set(
        rays_d[:32] / jnp.linalg.norm(rays_d[:32], axis=-1, keepdims=True))
    rc = RenderConfig(test_layout="bucket", test_march_window=32)
    out = render_test(model, params, bitfield, rays_o, rays_d, rc)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
