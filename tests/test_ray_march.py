"""Ray-marching parity tests.

1. `t_step_grid` closed form vs the sequential CUDA recurrence
   t_{k+1} = t_k + calc_dt(t_k)  (raymarching.cu:11-13).
2. The vectorized probe-every-step march vs a literal transcription of
   the CUDA empty-space-skip DDA (raymarching.cu:200-234) running on
   the same step sequence — proving the two are sample-identical for
   single-cascade scenes.
3. Compaction bookkeeping (deterministic replacement of the
   atomicAdd compaction, raymarching.cu:237-241).
"""
import math

import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.ops import (
    march_rays_train,
    ray_aabb_intersect,
    t_step_grid,
)
from normal_clustering_nerf_tpu.ops.packbits import packbits

SQRT3 = math.sqrt(3.0)


def _calc_dt(t, f, max_samples, G, scale):
    lo, hi = SQRT3 / max_samples, SQRT3 * 2 * scale / G
    return max(lo, min(t * f, hi))


def test_t_step_grid_matches_recurrence():
    for f in [0.0, 1.0 / 256.0]:
        for scale, G, S in [(0.5, 64, 128), (1.0, 128, 256)]:
            max_samples = S
            t0 = np.array([0.0, 0.013, 0.4, 1.2], dtype=np.float32)
            grid = np.asarray(
                t_step_grid(
                    jnp.asarray(t0), S, exp_step_factor=f,
                    max_samples=max_samples, grid_size=G, scale=scale,
                )
            )
            for r, t_start in enumerate(t0):
                t = float(t_start)
                seq = []
                for _ in range(S):
                    seq.append(t)
                    t = t + _calc_dt(t, f, max_samples, G, scale)
                np.testing.assert_allclose(grid[r], seq, rtol=2e-4, atol=1e-6)


def _cuda_march_oracle(o, d, t1, t2, noise, occ_grid, G, scale, f, max_samples):
    """Literal transcription of raymarching_train_kernel
    (raymarching.cu:190-234), single cascade, on real-line t."""
    samples = []
    if t1 < 0:
        return samples
    dt = _calc_dt(t1, f, max_samples, G, scale)
    t = t1 + dt * noise
    while 0 <= t < t2 and len(samples) < max_samples:
        x = o + t * d
        dt = _calc_dt(t, f, max_samples, G, scale)
        bound = min(0.5, scale)  # mip 0 for cascades=1
        n = np.clip(0.5 * (x / bound + 1) * G, 0, G - 1).astype(np.int64)
        if occ_grid[n[0], n[1], n[2]]:
            samples.append((t, dt))
            t += dt
        else:
            exits = []
            for a in range(3):
                s = 1.0 if d[a] >= 0 else -1.0
                exits.append(
                    (((n[a] + 0.5 + 0.5 * s) / G * 2 - 1) * bound - x[a]) / d[a]
                )
            t_target = t + max(0.0, min(exits))
            while True:
                t += _calc_dt(t, f, max_samples, G, scale)
                if t >= t_target:
                    break
    return samples


def test_march_matches_cuda_skip_dda(rng):
    G, scale, max_samples = 32, 0.5, 256
    # random-ish occupancy: a solid box plus noise
    occ = rng.random((G, G, G)) > 0.7
    occ[8:24, 8:24, 8:24] = True
    # bitfield in linear x-fastest order: idx = (z*G + y)*G + x
    flat = occ.transpose(2, 1, 0).reshape(-1)  # idx -> occ[x,y,z]
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)

    N = 64
    rays_o = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(N).astype(np.float32)

    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale)
    )
    res = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield, jnp.asarray(noise),
        cascades=1, scale=scale, exp_step_factor=0.0, grid_size=G,
        max_samples=max_samples, sample_budget=N * 64,
    )
    ray_id = np.asarray(res.ray_id)
    t_c = np.asarray(res.t)
    valid = np.asarray(res.valid)
    counts = np.asarray(res.ray_count)
    hits_np = np.asarray(hits)

    n_match = 0
    for r in range(N):
        mine = t_c[(ray_id == r) & valid]
        ref = _cuda_march_oracle(
            rays_o[r], d[r], hits_np[r, 0], hits_np[r, 1], noise[r],
            occ, G, scale, 0.0, max_samples,
        )
        ref_t = np.array([s[0] for s in ref])
        assert counts[r] == len(mine)
        # float accumulation differs (closed-form vs sequential adds) so
        # boundary cells can flip; demand exact agreement for the vast
        # majority of rays and near-agreement always
        if len(mine) == len(ref_t) and np.allclose(mine, ref_t, rtol=1e-4, atol=1e-5):
            n_match += 1
        else:
            assert abs(len(mine) - len(ref_t)) <= max(2, 0.05 * len(ref_t))
    assert n_match >= int(0.9 * N)


def test_march_compaction_bookkeeping(rng):
    G, scale = 16, 0.5
    occ = np.ones((G, G, G), bool)
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    N, S = 8, 64
    rays_o = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (N, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale)
    )
    B = 100  # deliberately too small: 8 rays * ~57 samples >> 100
    res = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.zeros(N), cascades=1, scale=scale, exp_step_factor=0.0,
        grid_size=G, max_samples=S, sample_budget=B,
    )
    valid = np.asarray(res.valid)
    ray_id = np.asarray(res.ray_id)
    counts = np.asarray(res.ray_count)
    starts = np.asarray(res.ray_start)
    assert valid.sum() == min(int(res.rm_samples), B)
    # ray-major ordering and start/count coherence
    assert np.all(np.diff(ray_id[valid]) >= 0)
    assert counts.sum() == valid.sum()
    np.testing.assert_array_equal(np.cumsum(counts) - counts, starts)
    # budget truncation drops the far tail only
    assert counts[0] > 0 and counts[-1] == 0


def test_dense_march_matches_flat(rng):
    """march_rays_train_dense must produce the exact sample set of
    march_rays_train with per_ray_cap=K and a non-binding budget."""
    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense,
    )

    G, scale, max_samples = 32, 0.5, 256
    occ = rng.random((G, G, G)) > 0.6
    occ[10:20, 10:20, 10:20] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)

    N, K = 32, 16
    rays_o = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(N).astype(np.float32)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale)
    )
    common = dict(cascades=1, scale=scale, exp_step_factor=0.0,
                  grid_size=G, max_samples=max_samples)
    flat_res = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), sample_budget=N * K, per_ray_cap=K, **common)
    dense = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), samples_per_ray=K, **common)

    assert int(dense.rm_samples) == int(flat_res.rm_samples)
    np.testing.assert_array_equal(
        np.asarray(dense.ray_count), np.asarray(flat_res.ray_count))
    f_ray = np.asarray(flat_res.ray_id)
    f_valid = np.asarray(flat_res.valid)
    f_t, f_dt = np.asarray(flat_res.t), np.asarray(flat_res.dt)
    d_t, d_dt = np.asarray(dense.t), np.asarray(dense.dt)
    d_valid = np.asarray(dense.valid)
    for r in range(N):
        mine = d_t[r][d_valid[r]]
        ref = f_t[(f_ray == r) & f_valid]
        np.testing.assert_allclose(mine, ref, rtol=1e-6)
        np.testing.assert_allclose(
            d_dt[r][d_valid[r]], f_dt[(f_ray == r) & f_valid], rtol=1e-6)
    # dense valid entries are front-packed per row
    first_invalid = d_valid.shape[1] - np.argmax(d_valid[:, ::-1], axis=1)
    assert np.all(d_valid.sum(1) == np.where(d_valid.any(1), first_invalid, 0))


def test_select_first_k_basic():
    from normal_clustering_nerf_tpu.ops.ray_march import select_first_k

    inc = jnp.asarray([
        [False, True, False, True, True],
        [False, False, False, False, False],
        [True, True, True, True, True],
    ])
    idx, valid = select_first_k(inc, 3)
    np.testing.assert_array_equal(np.asarray(valid), [
        [True, True, True], [False, False, False], [True, True, True]])
    np.testing.assert_array_equal(np.asarray(idx)[0], [1, 3, 4])
    np.testing.assert_array_equal(np.asarray(idx)[2], [0, 1, 2])


def test_coarse_pruned_march_matches_exact(rng):
    """The two-level coarse-pruned march must reproduce the exact dense
    march sample-for-sample when coarse_k_blocks is generous (pruned
    blocks are provably empty; see ops/ray_march.py coarse_lookup)."""
    from normal_clustering_nerf_tpu.models.occupancy import coarse_occupancy
    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense,
    )

    G, scale, max_samples = 32, 0.5, 256
    occ = rng.random((G, G, G)) > 0.9
    occ[10:20, 10:20, 10:20] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    coarse = coarse_occupancy(bitfield, G)

    N, K = 48, 16
    rays_o = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(N).astype(np.float32)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale)
    )
    common = dict(cascades=1, scale=scale, exp_step_factor=0.0,
                  grid_size=G, max_samples=max_samples,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), **common)
    pruned = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), coarse_occ=coarse, coarse_k_blocks=64, **common)

    np.testing.assert_array_equal(
        np.asarray(pruned.ray_count), np.asarray(exact.ray_count))
    e_v, p_v = np.asarray(exact.valid), np.asarray(pruned.valid)
    np.testing.assert_array_equal(p_v, e_v)
    np.testing.assert_allclose(
        np.asarray(pruned.t)[p_v], np.asarray(exact.t)[e_v], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pruned.dt)[p_v], np.asarray(exact.dt)[e_v], rtol=1e-6)


def test_sv_march_matches_exact(rng):
    """The supervoxel-run march must reproduce the exact dense march
    sample-for-sample on realistic occupancy (walls + clutter)."""
    from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense, march_rays_train_dense_sv,
    )

    G, scale, max_samples = 32, 0.5, 256
    occ = rng.random((G, G, G)) > 0.97
    occ[:3] = occ[-3:] = True
    occ[:, :3] = occ[:, -3:] = True
    occ[:, :, :3] = occ[:, :, -3:] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    sv_mask, sv_payload = supervoxel_tables(bitfield, G)

    N, K = 64, 16
    rays_o = rng.uniform(-0.45, 0.45, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.random(N).astype(np.float32)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale)
    )
    common = dict(scale=scale, grid_size=G, max_samples=max_samples,
                  samples_per_ray=K)
    exact = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.asarray(noise), cascades=1, exp_step_factor=0.0, **common)
    svr = march_rays_train_dense_sv(
        jnp.asarray(rays_o), jnp.asarray(d), hits, sv_mask, sv_payload,
        jnp.asarray(noise), n_intervals=24, **common)

    e_v, s_v = np.asarray(exact.valid), np.asarray(svr.valid)
    np.testing.assert_array_equal(
        np.asarray(svr.ray_count), np.asarray(exact.ray_count))
    for r in range(N):
        np.testing.assert_allclose(
            np.asarray(svr.t)[r][s_v[r]], np.asarray(exact.t)[r][e_v[r]],
            rtol=1e-6, atol=1e-7, err_msg=f"ray {r}")
    np.testing.assert_allclose(
        np.asarray(svr.dt)[s_v], np.asarray(exact.dt)[e_v], rtol=1e-6)


def test_stratified_budget_exact_when_under_cap():
    """tail_k selection must equal plain first-K when M <= K."""
    from normal_clustering_nerf_tpu.ops.ray_march import stratified_budget

    inc = jnp.asarray(np.array([
        [1, 0, 1, 1, 0, 0, 1, 0],   # M=4 <= K=6
        [0, 0, 0, 0, 0, 0, 0, 0],   # empty
    ], bool))
    sel, span = stratified_budget(inc, 6, 2)
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(inc))
    assert np.all(np.asarray(span)[np.asarray(sel)] == 1)


def test_stratified_budget_covers_distal():
    """With M >> K, the tail must sample to the END of the ray and the
    scaled dt flags must account for the skipped occupied steps."""
    from normal_clustering_nerf_tpu.ops.ray_march import stratified_budget

    S, K, TK = 256, 32, 8
    inc = jnp.ones((1, S), bool)      # fully occupied (fog scenario)
    sel, span = stratified_budget(inc, K, TK)
    sel_np = np.asarray(sel)[0]
    span_np = np.asarray(span)[0]
    assert sel_np.sum() == K          # ALL budget slots used
    # head pool: first K-TK samples verbatim
    assert sel_np[: K - TK].all()
    # tail reaches the distal end exactly (even-rank selection always
    # places its last pick on the final occupied step)
    assert sel_np[S - 1]
    # selected spans integrate the whole remainder, nothing more
    assert span_np[sel_np][K - TK:].sum() == S - (K - TK)


def test_dense_march_tail_reaches_walls(rng):
    """Fog scenario e2e: under a DENSE occupancy grid the tail samples
    must include distal-wall samples (the first-K cap alone confines
    every sample to the first 0.05 units — the round-3 fog failure)."""
    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense,
    )

    G, scale, max_samples = 64, 0.5, 512
    occ = np.ones((G, G, G), bool)
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    N, K = 16, 32
    rays_o = np.zeros((N, 3), np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.zeros(3), jnp.full(3, scale))
    common = dict(cascades=1, scale=scale, exp_step_factor=0.0,
                  grid_size=G, max_samples=max_samples, samples_per_ray=K)
    capped = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.zeros(N), tail_k=0, **common)
    tailed = march_rays_train_dense(
        jnp.asarray(rays_o), jnp.asarray(d), hits, bitfield,
        jnp.zeros(N), tail_k=8, **common)
    t2 = np.asarray(hits)[:, 1]
    t_cap = np.asarray(capped.t)
    t_tail = np.asarray(tailed.t)
    v_tail = np.asarray(tailed.valid)
    # the pure cap never gets past K*lo (the fog confinement radius)
    assert (t_cap.max(1) <= K * SQRT3 / max_samples + 1e-6).all()
    # the tail reaches the end of every ray up to one stride
    # (stride = ceil((M - K1)/tail_k) steps of lo)
    lo = SQRT3 / max_samples
    stride = np.ceil((t2 / lo - (K - 8)) / 8.0)
    far = np.where(v_tail, t_tail, 0).max(1)
    assert (far >= t2 - (stride + 1) * lo).all()
    # dt still integrates the whole selected span: sum(dt) ~ ray length
    dt_sum = np.asarray(tailed.dt).sum(1)
    np.testing.assert_allclose(dt_sum, t2, rtol=0.15)
