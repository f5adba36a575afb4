"""Production-scale (G=128) sv-march and inference-layout parity.

Round-2 shipped a 2 dB bucket-vs-flat divergence that the G=16/32 toy
parity tests missed: `jnp.exp2` in the sv payload-bit extraction is a
polynomial approximation that can be 1 ulp off, flipping occupancy bits
on ~4% of rays at G=128 (fixed: integer vector shift). These tests pin
sample-exact parity at the bench grid size so boundary-density bugs
can't hide in toys again.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import (
    march_rays_test_round_dense, march_rays_test_round_sv,
    march_rays_train_dense, march_rays_train_dense_sv,
)

G, SCALE, MAX_S = 128, 0.5, 1024


def _room_occ(rng):
    """Trained-room-like occupancy: wall shell + sparse clutter."""
    occ = rng.random((G, G, G)) > 0.995
    w = G // 8
    occ[:w] = occ[-w:] = True
    occ[:, :w] = occ[:, -w:] = True
    occ[:, :, :w] = occ[:, :, -w:] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    return bitfield


def _rays(rng, n):
    rays_o = rng.uniform(-0.35, 0.35, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, SCALE))
    return jnp.asarray(rays_o), jnp.asarray(d), hits


def test_sv_train_march_exact_at_g128(rng):
    bitfield = _room_occ(rng)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)
    ro, rd, hits = _rays(rng, 256)
    noise = jnp.asarray(rng.random(256).astype(np.float32))
    K = 32
    common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        ro, rd, hits, bitfield, noise, cascades=1, exp_step_factor=0.0,
        **common)
    svr = march_rays_train_dense_sv(
        ro, rd, hits, sv_mask, sv_payload, noise, n_intervals=48, **common)
    assert int(svr.trunc_rays) == 0
    np.testing.assert_array_equal(
        np.asarray(svr.ray_count), np.asarray(exact.ray_count))
    e_v, s_v = np.asarray(exact.valid), np.asarray(svr.valid)
    np.testing.assert_array_equal(s_v, e_v)
    np.testing.assert_allclose(
        np.asarray(svr.t)[s_v], np.asarray(exact.t)[e_v], rtol=1e-6, atol=1e-7)


def test_sv_test_rounds_exact_at_g128(rng):
    """Multi-round cursor-continuation parity: the sv test rounds must
    enumerate the identical sample stream as the dense-window oracle."""
    bitfield = _room_occ(rng)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)
    N = 128
    ro, rd, hits = _rays(rng, N)
    t1 = np.asarray(hits)[:, 0]
    t2j = jnp.asarray(np.asarray(hits)[:, 1])
    alive = jnp.asarray(t1 >= 0)
    cursor_d = jnp.asarray(np.where(t1 >= 0, t1, -1).astype(np.float32))
    cursor_s = cursor_d
    samp_d = [[] for _ in range(N)]
    samp_s = [[] for _ in range(N)]
    for _ in range(16):
        tg, _, val, cursor_d = march_rays_test_round_dense(
            ro, rd, cursor_d, t2j, alive, bitfield, cascades=1, scale=SCALE,
            exp_step_factor=0.0, grid_size=G, max_samples=MAX_S, n_steps=128)
        tgn, valn = np.asarray(tg), np.asarray(val)
        t_k, _, v_k, cursor_s = march_rays_test_round_sv(
            ro, rd, cursor_s, t2j, alive, sv_mask, sv_payload,
            scale=SCALE, grid_size=G, max_samples=MAX_S, n_steps=32)
        tkn, vkn = np.asarray(t_k), np.asarray(v_k)
        for r in range(N):
            samp_d[r].extend(tgn[r][valn[r]].tolist())
            samp_s[r].extend(tkn[r][vkn[r]].tolist())
    for r in range(N):
        a = np.sort(np.array(samp_d[r], np.float64))
        b = np.sort(np.array(samp_s[r], np.float64))
        m = min(len(a), len(b))  # fixed round count -> horizons differ
        np.testing.assert_allclose(a[:m], b[:m], rtol=1e-5, atol=1e-6,
                                   err_msg=f"ray {r}")


def test_render_layouts_agree_at_production_scale(rng):
    """bucket / bucket+sv vs the flat oracle on a foggy field at the
    bench grid size: per-ray outputs must match to float tolerance
    (VERDICT r2 weak #3 measured 2 dB divergence here)."""
    from normal_clustering_nerf_tpu.config import ModelConfig, RenderConfig
    from normal_clustering_nerf_tpu.models import NGPMT
    from normal_clustering_nerf_tpu.models.rendering import render_test

    mcfg = ModelConfig(scale=0.5, grid_size=G, max_samples=MAX_S,
                       n_levels=4, log2_hashmap_size=12, hidden_dim=16,
                       hash_layout="tcnn")
    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(3))
    # fog: scaled sigma head -> real densities and early termination
    params["sigma_net"]["w1"] = params["sigma_net"]["w1"] * 8.0

    bitfield = _room_occ(rng)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)
    N = 1024
    ro, rd, _ = _rays(rng, N)

    rc = RenderConfig(test_layout="flat", march_coarse=False)
    out_f = render_test(model, params, bitfield, ro, rd, rc)
    rc_b = dataclasses.replace(rc, test_layout="bucket")
    out_b = render_test(model, params, bitfield, ro, rd, rc_b)
    rc_s = dataclasses.replace(rc, test_layout="bucket", march_coarse=True)
    out_s = render_test(model, params, bitfield, ro, rd, rc_s,
                        sv_mask=sv_mask, sv_payload=sv_payload)
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_f[k]), rtol=1e-4, atol=1e-4,
            err_msg=f"bucket {k}")
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_f[k]), rtol=1e-4, atol=1e-4,
            err_msg=f"bucket_sv {k}")
