"""Manhattan-frame rotation recovery from clustered depth-normals.

TPU-native equivalent of the reference's validation-epoch-end analysis
(reference: train_nerf.py:489-528): cluster all test-set depth-normals
(K=30, 30 iters), build an orthonormal frame from the three dominant
centroids, match columns/signs against the applied R_offset, project to
SO(3), and report per-axis (yaw/pitch/roll) absolute angular errors.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import normals_clustering
from ..utils.rotations import matrix_to_euler_angles, project_to_SO3


def recover_rotation(normals: np.ndarray, key, K=30, niter=30,
                     t_similar=0.99, restarts=3) -> np.ndarray:
    """Cluster normals, return the (3, 3) matrix of the three dominant
    orthogonal cluster centroids (columns), SO(3)-projected.

    K-means init is random (the reference inherits FAISS's random init,
    losses.py:86-93) and the dominant-triplet pick occasionally lands on
    a skewed triple; we run a few restarts and keep the frame that best
    explains the data: highest mean |n . nearest frame axis| over all
    valid normals (a GT-free fit score)."""
    normals = np.asarray(normals, np.float32).reshape(-1, 3)
    norms = np.linalg.norm(normals, axis=-1)
    valid = (norms > 1e-6) & np.isfinite(norms)
    n = normals.copy()
    n[valid] /= norms[valid][:, None]
    n_j, valid_j = jnp.asarray(n), jnp.asarray(valid)
    nv = n[valid]
    if nv.shape[0] < 3:
        # untrained / degenerate depth: every normal is zero (e.g.
        # --val_only before training). NaN scores would otherwise leave
        # best_R as None; validate() catches ValueError and logs
        # ang/clust/failed (reference behavior: the clustering simply
        # produces garbage there).
        raise ValueError(f"rotation recovery needs >= 3 valid normals, "
                         f"got {nv.shape[0]}")
    best_R, best_score = None, -np.inf
    for r in range(restarts):
        res = normals_clustering(
            n_j, valid_j, jax.random.fold_in(key, r), K=K, niter=niter,
            t_similar=t_similar,
        )
        C = np.asarray(res.centroids3, np.float64).T  # columns = centroids
        if np.linalg.det(C) < 0:
            # wall normals constrain axis directions only up to sign:
            # a left-handed centroid triple is equivalent to the
            # right-handed one with a column flipped, but SVD-projecting
            # the improper matrix directly produces a garbage rotation
            # ~45 deg from every axis (r5 bug — recovery failed at
            # 40 deg on 6-deg-median normals whenever k-means happened
            # to deliver det < 0, which is a fair coin per draw)
            C[:, 2] *= -1.0
        R = project_to_SO3(C)
        score = float(np.mean(np.max(np.abs(nv @ R), axis=-1)))
        if score > best_score:
            best_score, best_R = score, R
    return best_R


def rotation_recovery_errors(normals: np.ndarray, R_offset: np.ndarray,
                             key) -> Dict[str, float]:
    """Per-axis angular error of the recovered Manhattan frame vs the
    ground-truth applied offset (train_nerf.py:504-528). Handles column
    permutation/sign ambiguity by greedy nearest-column matching."""
    R_rec = recover_rotation(normals, key)
    # match recovered columns to R_offset columns with sign freedom
    R_off = np.asarray(R_offset, np.float64)
    cols = []
    used = set()
    for j in range(3):
        sims = [
            (abs(float(R_rec[:, i] @ R_off[:, j])), i)
            for i in range(3) if i not in used
        ]
        _, best = max(sims)
        used.add(best)
        sign = np.sign(float(R_rec[:, best] @ R_off[:, j])) or 1.0
        cols.append(sign * R_rec[:, best])
    M = np.stack(cols, axis=1)
    # Wall normals constrain the frame's AXIS DIRECTIONS only up to
    # sign, so the greedy per-column sign pick can produce a LEFT-handed
    # triple; project_to_SO3's det=+1 correction then silently warps
    # the frame by ~40-180 deg (r5 bug: recovery failed at 40 deg on
    # 6-deg-median normals whenever the k-means draw delivered an
    # improper triple). Resolve the ambiguity by enumerating the
    # proper-rotation sign choices and keeping the one closest to
    # R_offset (the reference notes the same ambiguity,
    # train_nerf.py:507-510).
    candidates = []
    for flips in ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)):
        Mc = M.copy()
        for f in flips:
            Mc[:, f] *= -1.0
        if np.linalg.det(Mc) <= 0:
            continue
        Rc = project_to_SO3(Mc)
        cos = np.clip((np.trace(Rc @ R_off.T) - 1.0) / 2.0, -1.0, 1.0)
        candidates.append((float(np.arccos(cos)), Rc))
    R_matched = min(candidates, key=lambda t: t[0])[1]
    # residual rotation and its ZYX euler decomposition
    R_err = R_matched @ R_off.T
    ang = matrix_to_euler_angles(R_err, "ZYX") * 180.0 / math.pi
    return {
        "ang/clust/yaw_abs": abs(float(ang[0])),
        "ang/clust/pitch_abs": abs(float(ang[1])),
        "ang/clust/roll_abs": abs(float(ang[2])),
    }
