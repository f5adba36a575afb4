"""On-device spherical k-means and Manhattan cluster selection.

Replaces the reference's per-step GPU->CPU round-trip through FAISS
(reference: losses.py:86-93 `faiss.Kmeans(3, k, spherical=True)`, call
site losses.py:433-440 with `.detach().cpu().numpy()`) with a fully
jittable formulation: assignment is a (M, K) matmul + argmax, the
centroid update a segment-sum + renormalize, iterated with
`lax.fori_loop`. The cluster-selection logic (biggest cluster, most
mutually-orthogonal pair, similar-cluster merging, opposite-cluster
flipping — losses.py:47-166) is reproduced branch-free with masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def spherical_kmeans(normals, valid, key, K=20, niter=20):
    """Spherical k-means over unit vectors.

    Args:
      normals: (M, 3) unit vectors (invalid rows arbitrary).
      valid: (M,) bool mask.
      key: PRNG key for centroid init (random valid points, matching
        FAISS's sample-based init in spirit).
    Returns:
      centroids: (K, 3) unit vectors.
      assign: (M,) int32 nearest-centroid ids (by max dot product,
        the spherical/inner-product metric FAISS uses).
    """
    M = normals.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, M, shape=(K,), replace=False, p=p)
    init = normals[idx]

    def step(_, centroids):
        sim = normals @ centroids.T                      # (M, K)
        assign = jnp.argmax(sim, axis=-1).astype(jnp.int32)
        w = valid.astype(normals.dtype)[:, None]
        sums = jax.ops.segment_sum(normals * w, assign, num_segments=K)
        norm = jnp.linalg.norm(sums, axis=-1, keepdims=True)
        return jnp.where(norm > 1e-12, sums / jnp.maximum(norm, 1e-12), centroids)

    # fori_loop, not unrolled: unrolling the 20 tiny iterations was
    # measured 0.9% SLOWER end-to-end (r5) — the sequential dependency
    # dominates either way and the unrolled program just compiles bigger
    centroids = jax.lax.fori_loop(0, niter, step, init)
    assign = jnp.argmax(normals @ centroids.T, axis=-1).astype(jnp.int32)
    return centroids, assign


class ClusteringResult(NamedTuple):
    assign_new: jnp.ndarray   # (M,) int32 in {-3..3}; 0 = discarded
    assign_orig: jnp.ndarray  # (M,) int32 raw k-means ids
    centroids3: jnp.ndarray   # (3, 3) centroids of C1, C2, C3


def normals_clustering(
    normals,
    valid,
    key,
    *,
    K: int = 20,
    niter: int = 20,
    t_similar: float = 0.99,
    merge_clusters: bool = True,
    find_opposite: bool = True,
) -> ClusteringResult:
    """Cluster depth-normals and pick the three most mutually-orthogonal
    clusters (reference: losses.py:75-166 `_normals_clustering`).

    Selection, reproduced exactly:
      * C1 = biggest cluster (losses.py:103-107).
      * (C2, C3) minimize |sim(.,C1)| + |sim(C1,.)| + |sim(.,.)| via the
        column-min/argmin criteria matrix (losses.py:117-120).
      * merging: members of any cluster j with sim(c_g, j) > t_similar
        join group g (losses.py:47-54).
      * opposite clusters (dot < -t_similar with a group centroid) get
        the negated label for later flipping (losses.py:57-72,139-163).
    Sequential overwrite order (1, 2, 3, -1, -2, -3) matches the
    reference's in-place writes.
    """
    centroids, assign = spherical_kmeans(normals, valid, key, K=K, niter=niter)
    sim = centroids @ centroids.T                       # (K, K)
    sim_abs = jnp.abs(sim)

    sizes = jax.ops.segment_sum(valid.astype(jnp.int32), assign, num_segments=K)
    c1 = jnp.argmax(sizes)

    criteria = sim_abs[:, c1][:, None] + sim_abs[c1, :][None, :] + sim_abs
    mins = jnp.min(criteria, axis=0)
    min_idx = jnp.argmin(criteria, axis=0)
    c2 = jnp.argmin(mins)
    c3 = min_idx[c2]

    def member_mask(c_i):
        # clusters merged into group of c_i (losses.py:47-54)
        if merge_clusters:
            sel = sim[c_i] > t_similar                  # (K,)
        else:
            sel = jnp.arange(K) == c_i
        return sel[assign]                              # (M,)

    new = jnp.zeros_like(assign)
    new = jnp.where(member_mask(c1) & valid, 1, new)
    new = jnp.where(member_mask(c2) & valid, 2, new)
    new = jnp.where(member_mask(c3) & valid, 3, new)

    if find_opposite:
        for g, ci in enumerate((c1, c2, c3)):
            cand = sim[ci]
            o = jnp.argmin(cand)
            is_opp = (-cand[o]) > t_similar
            new = jnp.where(is_opp & member_mask(o) & valid, -(g + 1), new)

    centroids3 = centroids[jnp.stack([c1, c2, c3])]
    return ClusteringResult(assign_new=new, assign_orig=assign, centroids3=centroids3)
