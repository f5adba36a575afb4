"""Camera-ray geometry utilities (pure JAX/numpy).

TPU-native equivalents of the reference's torch/kornia helpers
(reference: datasets/ray_utils.py). Conventions identical: camera looks
down +z, pixel centers at +0.5, directions not normalized by default
(the pinhole path), c2w is (3, 4) or batched (N, 3, 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_ray_directions(H, W, K, random=False, rng=None, flatten=True):
    """Pinhole per-pixel ray directions in camera frame [right down front]
    (reference: datasets/ray_utils.py:8-42).

    Pure numpy: this is host-side dataset-init geometry, and on the TPU
    tunnel a device round-trip here would be both wasteful and (on the
    experimental axon backend) poison the process into a degraded
    dispatch mode — keep dataset code off-device.

    Args:
      random: jitter pixel offsets uniformly in-cell instead of +0.5.
      rng: np.random.Generator for the random path.
    Returns (H*W, 3) float32 (or (H, W, 3) when flatten=False).
    """
    u, v = np.meshgrid(
        np.arange(W, dtype=np.float32),
        np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    K = np.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        rng = rng or np.random.default_rng(0)
        ju = rng.uniform(size=u.shape).astype(np.float32)
        jv = rng.uniform(size=v.shape).astype(np.float32)
        dirs = np.stack([(u - cx + ju) / fx, (v - cy + jv) / fy,
                         np.ones_like(u)], -1)
    else:
        dirs = np.stack([(u - cx + 0.5) / fx, (v - cy + 0.5) / fy,
                         np.ones_like(u)], -1)
    dirs = dirs.astype(np.float32)
    if flatten:
        return dirs.reshape(-1, 3)
    return dirs


def get_rays(directions, c2w):
    """Camera-frame dirs + pose(s) -> world rays
    (reference: datasets/ray_utils.py:46-71).

    Args:
      directions: (N, 3); c2w: (3, 4) or (N, 3, 4).
    Returns: rays_o (N, 3), rays_d (N, 3) (not normalized).
    """
    if c2w.ndim == 2:
        rays_d = directions @ c2w[:, :3].T
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nij,nj->ni", c2w[..., :3], directions)
        rays_o = c2w[..., 3]
    return rays_o, rays_d


def axisangle_to_R(v):
    """Rodrigues axis-angle -> rotation matrix
    (reference: datasets/ray_utils.py:75-101).

    Args: v (3,) or (B, 3). Returns (3, 3) or (B, 3, 3).
    """
    single = v.ndim == 1
    if single:
        v = v[None]
    zero = jnp.zeros_like(v[:, :1])
    skew = jnp.stack([
        jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], 1),
        jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], 1),
        jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], 1),
    ], axis=1)
    norm = jnp.linalg.norm(v, axis=1)[:, None, None] + 1e-7
    eye = jnp.eye(3)[None]
    R = (
        eye
        + (jnp.sin(norm) / norm) * skew
        + ((1 - jnp.cos(norm)) / norm ** 2) * (skew @ skew)
    )
    return R[0] if single else R


# ------------------------------------------------------------------ numpy pose helpers
def normalize_np(v):
    return v / np.linalg.norm(v)


def average_poses(poses, pts3d=None):
    """Average pose for centering (reference: ray_utils.py:109-148)."""
    center = pts3d.mean(0) if pts3d is not None else poses[..., 3].mean(0)
    z = normalize_np(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize_np(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses, pts3d=None):
    """Recenter poses by the average pose (reference: ray_utils.py:151-179)."""
    pose_avg = average_poses(poses, pts3d)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    inv = np.linalg.inv(pose_avg_homo)
    last = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    homo = np.concatenate([poses, last], 1)
    centered = (inv @ homo)[:, :3]
    if pts3d is not None:
        pts = pts3d @ inv[:3, :3].T + inv[:3, 3]
        return centered, pts
    return centered


def create_spheric_poses(radius, mean_h, n_poses=120):
    """Circular poses around z (reference: ray_utils.py:181-216)."""
    def spheric_pose(theta, phi, r):
        trans = np.array([[1, 0, 0, 0], [0, 1, 0, 2 * mean_h], [0, 0, 1, -r]])
        rot_phi = np.array([
            [1, 0, 0],
            [0, np.cos(phi), -np.sin(phi)],
            [0, np.sin(phi), np.cos(phi)],
        ])
        rot_theta = np.array([
            [np.cos(theta), 0, -np.sin(theta)],
            [0, 1, 0],
            [np.sin(theta), 0, np.cos(theta)],
        ])
        c2w = rot_theta @ rot_phi @ trans
        return np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0]]) @ c2w

    return np.stack([
        spheric_pose(th, -np.pi / 12, radius)
        for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
    ])
