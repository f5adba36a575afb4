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
    best_R, best_score = None, -np.inf
    for r in range(restarts):
        res = normals_clustering(
            n_j, valid_j, jax.random.fold_in(key, r), K=K, niter=niter,
            t_similar=t_similar,
        )
        C = np.asarray(res.centroids3).T       # columns = centroids
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
    R_matched = project_to_SO3(np.stack(cols, axis=1))
    # residual rotation and its ZYX euler decomposition
    R_err = R_matched @ R_off.T
    ang = matrix_to_euler_angles(R_err, "ZYX") * 180.0 / math.pi
    return {
        "ang/clust/yaw_abs": abs(float(ang[0])),
        "ang/clust/pitch_abs": abs(float(ang[1])),
        "ang/clust/roll_abs": abs(float(ang[2])),
    }
