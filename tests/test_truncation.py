"""No-silent-caps: the bounded sv/coarse marches must COUNT rays whose
sample set they truncate (reference semantics are an unbounded per-ray
enumeration, raymarching.cu:166-332 — any bounded-budget deviation must
be visible in metrics, not silent).

Adversarial clutter fixture: thin occupied planes every few cells, so a
ray crosses MANY short occupied supervoxel runs.
"""
import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.models.occupancy import (
    coarse_occupancy, supervoxel_tables,
)
from normal_clustering_nerf_tpu.ops import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import (
    march_rays_train_dense, march_rays_train_dense_sv,
)

G, SCALE, MAX_S = 32, 0.5, 256


def _clutter_bitfield(period=8):
    """Thin z-planes every `period` cells: many 1-cell occupied runs."""
    occ = np.zeros((G, G, G), bool)
    occ[:, :, ::period] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    return packbits(jnp.asarray(flat.astype(np.float32)), 0.5)


def _rays(rng, n):
    rays_o = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(n).astype(np.float32)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, SCALE))
    return jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(noise), hits


def test_sv_truncation_counted_and_exact_when_zero(rng):
    bitfield = _clutter_bitfield()
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)
    ro, rd, noise, hits = _rays(rng, 96)
    K = 16
    common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        ro, rd, hits, bitfield, noise, cascades=1, exp_step_factor=0.0,
        **common)

    # tight interval budget on heavy clutter: truncation happens and the
    # counter sees every biased ray
    tight = march_rays_train_dense_sv(
        ro, rd, hits, sv_mask, sv_payload, noise, n_intervals=2, **common)
    n_short = int(np.sum(
        (np.asarray(tight.ray_count) < np.asarray(exact.ray_count))))
    assert n_short > 0, "fixture not adversarial enough"
    assert int(tight.trunc_rays) >= n_short

    # generous budget: counter at zero AND sample-exact parity
    loose = march_rays_train_dense_sv(
        ro, rd, hits, sv_mask, sv_payload, noise, n_intervals=40, **common)
    assert int(loose.trunc_rays) == 0
    np.testing.assert_array_equal(
        np.asarray(loose.ray_count), np.asarray(exact.ray_count))
    l_v, e_v = np.asarray(loose.valid), np.asarray(exact.valid)
    np.testing.assert_array_equal(l_v, e_v)
    np.testing.assert_allclose(
        np.asarray(loose.t)[l_v], np.asarray(exact.t)[e_v], rtol=1e-6)


def test_sv_no_truncation_at_default_knobs(rng):
    """Default production knobs (K=32, sv_intervals=8) on the clutter
    fixture: every under-filled flagged ray truly lost samples (no false
    positives), and exact rays are never flagged."""
    bitfield = _clutter_bitfield()
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)
    ro, rd, noise, hits = _rays(rng, 96)
    K = 32
    common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        ro, rd, hits, bitfield, noise, cascades=1, exp_step_factor=0.0,
        **common)
    svr = march_rays_train_dense_sv(
        ro, rd, hits, sv_mask, sv_payload, noise, n_intervals=8, **common)
    n_short = int(np.sum(
        np.asarray(svr.ray_count) < np.asarray(exact.ray_count)))
    # counter is an upper bound on actually-biased rays and exact when
    # every flagged ray lost samples
    assert int(svr.trunc_rays) >= n_short
    if int(svr.trunc_rays) == 0:
        np.testing.assert_array_equal(
            np.asarray(svr.ray_count), np.asarray(exact.ray_count))


def test_coarse_truncation_counted(rng):
    bitfield = _clutter_bitfield()
    coarse = coarse_occupancy(bitfield, G)
    ro, rd, noise, hits = _rays(rng, 96)
    K = 16
    common = dict(cascades=1, scale=SCALE, exp_step_factor=0.0,
                  grid_size=G, max_samples=MAX_S, samples_per_ray=K)
    exact = march_rays_train_dense(ro, rd, hits, bitfield, noise, **common)
    assert int(exact.trunc_rays) == 0  # exact path never truncates

    tight = march_rays_train_dense(
        ro, rd, hits, bitfield, noise, coarse_occ=coarse,
        coarse_k_blocks=4, **common)
    n_short = int(np.sum(
        np.asarray(tight.ray_count) < np.asarray(exact.ray_count)))
    assert n_short > 0, "fixture not adversarial enough"
    assert int(tight.trunc_rays) >= n_short

    loose = march_rays_train_dense(
        ro, rd, hits, bitfield, noise, coarse_occ=coarse,
        coarse_k_blocks=64, **common)
    assert int(loose.trunc_rays) == 0
    np.testing.assert_array_equal(
        np.asarray(loose.ray_count), np.asarray(exact.ray_count))


def test_sv_auto_full_horizon_never_truncates_diagonal(rng):
    """ADVICE r3: the auto-full horizon (n_intervals=0) must bound the
    TRUE maximum supervoxel visits — axis-plane crossings (~3*Gc), not
    the sqrt(3)*Gc diagonal length. Near-diagonal rays through a FULLY
    occupied grid are the worst case: every supervoxel crossing is an
    occupied run."""
    occ = np.ones((G, G, G), bool)
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)

    n = 32
    rays_o = rng.uniform(-0.49, -0.4, (n, 3)).astype(np.float32)
    d = (np.ones((n, 3)) + rng.uniform(-0.05, 0.05, (n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(n).astype(np.float32)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, SCALE))

    K = 64
    common = dict(scale=SCALE, grid_size=G, max_samples=MAX_S,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), cascades=1, exp_step_factor=0.0, **common)
    svr = march_rays_train_dense_sv(
        jnp.asarray(rays_o), jnp.asarray(d), hits, sv_mask, sv_payload,
        jnp.asarray(noise), n_intervals=0, **common)
    assert int(svr.trunc_rays) == 0
    np.testing.assert_array_equal(
        np.asarray(svr.ray_count), np.asarray(exact.ray_count))
    s_v, e_v = np.asarray(svr.valid), np.asarray(exact.valid)
    np.testing.assert_array_equal(s_v, e_v)
    np.testing.assert_allclose(
        np.asarray(svr.t)[s_v], np.asarray(exact.t)[e_v], rtol=1e-6)
