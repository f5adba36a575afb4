"""Loss-stack unit tests: clustering selection logic, weight schedule,
distortion gradient oracle, masked validity (SURVEY.md §2.3)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.losses import w_sched, triang_idx, patch_triang_idx
from normal_clustering_nerf_tpu.ops import (
    distortion_loss,
    normals_clustering,
    ray_sphere_intersect,
    spherical_kmeans,
)
from normal_clustering_nerf_tpu.ops.distortion import distortion_reference_grad


def test_w_sched_matches_reference():
    # reference: losses.py:217 w_sched = max(0, min(w, (step-start)*w/grow))
    w, start, grow = 0.5, 100, 400
    for step, expect in [(0, 0.0), (100, 0.0), (300, 0.25), (500, 0.5),
                         (900, 0.5)]:
        got = float(w_sched(w, jnp.asarray(step), start, grow))
        assert abs(got - expect) < 1e-6, (step, got, expect)


def test_triang_indices():
    idx = triang_idx(12)
    np.testing.assert_array_equal(idx["x1"], [0, 3, 6, 9])
    np.testing.assert_array_equal(idx["x2"], [1, 4, 7, 10])
    np.testing.assert_array_equal(idx["x3"], [2, 5, 8, 11])
    # patch version (losses.py:307-313)
    p = 2
    offs = {"x1": np.array([3]), "x2": np.array([1]), "x3": np.array([2])}
    pidx = patch_triang_idx(8, p * p, offs)
    np.testing.assert_array_equal(pidx["x1"], [3, 7])
    np.testing.assert_array_equal(pidx["x2"], [1, 5])
    np.testing.assert_array_equal(pidx["x3"], [2, 6])


def _three_axis_normals(rng, n=600, noise=0.02):
    axes = np.eye(3)
    labels = rng.integers(0, 3, n)
    signs = rng.choice([-1.0, 1.0], n)
    v = axes[labels] * signs[:, None] + rng.standard_normal((n, 3)) * noise
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v.astype(np.float32), labels


def test_spherical_kmeans_recovers_axes(rng):
    v, _ = _three_axis_normals(rng)
    C, assign = spherical_kmeans(
        jnp.asarray(v), jnp.ones(len(v), bool), jax.random.PRNGKey(0),
        K=8, niter=15)
    C = np.asarray(C)
    # every input should be within a few degrees of its centroid
    sims = (v @ C.T).max(axis=1)
    assert np.median(sims) > 0.995


def test_normals_clustering_selects_orthogonal_triplet(rng):
    v, labels = _three_axis_normals(rng, n=900)
    res = normals_clustering(
        jnp.asarray(v), jnp.ones(len(v), bool), jax.random.PRNGKey(1),
        K=10, niter=15, t_similar=0.99)
    cents = np.asarray(res.centroids3)
    # the three selected centroids are near-orthogonal
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(cents[i] @ cents[j]) < 0.12
    # members assigned to groups 1..3 (opposites negated) cover most points
    a = np.asarray(res.assign_new)
    assert np.mean(a != 0) > 0.9
    # flipped members (negative labels) are opposite their group centroid
    for g in range(1, 4):
        mask = a == -g
        if mask.any():
            assert np.mean(v[mask] @ cents[g - 1]) < -0.9


def test_distortion_autodiff_matches_reference_backward(rng):
    N, B = 6, 48
    counts = rng.integers(1, 12, N)
    counts = (counts / counts.sum() * B).astype(np.int32)
    counts[-1] = B - counts[:-1].sum()
    ray_id = np.repeat(np.arange(N, dtype=np.int32), counts)
    start = np.cumsum(counts) - counts
    ws = jnp.asarray(rng.uniform(0, 0.2, B).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.001, 0.01, B).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.uniform(0.1, 1.5, B)).astype(np.float32))
    valid = jnp.ones(B, bool)
    dL = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    def scalar(w):
        per_ray = distortion_loss(
            w, deltas, ts, jnp.asarray(ray_id), jnp.asarray(start), valid, N)
        return jnp.sum(per_ray * dL)

    g = jax.grad(scalar)(ws)
    g_ref = distortion_reference_grad(
        dL, ws, deltas, ts, jnp.asarray(ray_id), jnp.asarray(start), valid, N)
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-6)


def test_distortion_zero_for_delta_weight(rng):
    """A single concentrated sample per ray gives (near-)minimal loss."""
    N = 4
    ray_id = jnp.arange(N, dtype=jnp.int32)
    start = jnp.arange(N, dtype=jnp.int32)
    ws = jnp.ones(N)
    deltas = jnp.full(N, 1e-4)
    ts = jnp.full(N, 0.5)
    out = distortion_loss(ws, deltas, ts, ray_id, start, jnp.ones(N, bool), N)
    assert float(jnp.max(out)) < 1e-3


def test_ray_sphere_intersect_golden():
    o = jnp.asarray([[0.0, 0, -2], [0, 0, 0], [0, 2, -2]])
    d = jnp.asarray([[0.0, 0, 1], [0, 0, 1], [0, 0, 1]])
    t = np.asarray(ray_sphere_intersect(o, d, jnp.zeros(3), 1.0))
    np.testing.assert_allclose(t[0], [1.0, 3.0], atol=1e-6)   # outside hit
    np.testing.assert_allclose(t[1], [0.0, 1.0], atol=1e-6)   # inside
    np.testing.assert_allclose(t[2], [-1.0, -1.0])            # miss
