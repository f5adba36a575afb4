"""Surface normals from depth via pixel-triangle cross products.

The core geometric op of the method, appearing in two forms
(reference: datasets/hypersim_src/utils.py:504-541 ray-batch form used
inside the training loss; :543-611 full-image form used at
validation). Triangle layout over the pixel grid:

        ____|_x2_|____
        _x3_|_x1_|____
            |    |
"""
from __future__ import annotations

import jax.numpy as jnp


def _normalize(v, eps=1e-12):
    """Zero-safe unit normalization (returns 0 for zero vectors).

    Uses the double-where pattern: naive `v / max(||v||, eps)` is value-
    safe but its *gradient* at v=0 is NaN, and `0 * NaN = NaN` poisons
    the whole backward pass (degenerate triangles with equal unprojected
    points are common on zero-depth background rays)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = sq > eps
    safe = jnp.where(ok, sq, 1.0)
    return jnp.where(ok, v / jnp.sqrt(safe), 0.0)


def extract_normals_from_ray_batch(rays_o, rays_d, depth, x123_idx):
    """Normals at triangle pixels of a ray batch
    (reference: hypersim_src/utils.py:504-541).

    Args:
      rays_o/rays_d: (M, 3); depth: (M,) rendered depth.
      x123_idx: dict of (T,) int arrays 'x1','x2','x3' selecting the
        triangle corners within the batch.
    Returns: (T, 3) unit normals (one per triangle, at x1).
    """
    P = rays_o + rays_d * depth[:, None]
    P1 = P[x123_idx["x1"]]
    P2 = P[x123_idx["x2"]]
    P3 = P[x123_idx["x3"]]
    n = jnp.cross(P2 - P1, P3 - P1)
    return _normalize(n)


def extract_normals_from_depth_batch(depth, ray_dirs_cc, poses):
    """Full-image normals from depth (reference: utils.py:543-611).

    Args:
      depth: (B, H, W); ray_dirs_cc: (H*W, 3) camera-frame ray dirs;
      poses: (B, 3, 4) (or (B, 4, 4)) camera-to-world.
    Returns: (B, H, W, 3) world-frame unit normals; zero on the 1-pixel
      border and wherever depth is invalid (0/NaN/Inf).
    """
    B, H, W = depth.shape
    P_cc = ray_dirs_cc[None, :, :] * depth.reshape(B, H * W, 1)
    P_cc = P_cc.reshape(B, H, W, 3)
    P1 = P_cc[:, 1:-1, 1:-1]
    P2 = P_cc[:, :-2, 1:-1]
    P3 = P_cc[:, 1:-1, :-2]
    n = _normalize(jnp.cross(P2 - P1, P3 - P1))
    # rotate CC -> WC (orientation only)
    R = poses[:, :3, :3]
    n = jnp.einsum("bij,bhwj->bhwi", R, n)
    n = jnp.pad(n, ((0, 0), (1, 1), (1, 1), (0, 0)))
    invalid = (depth == 0.0) | jnp.isnan(depth) | jnp.isinf(depth)
    return jnp.where(invalid[..., None], 0.0, n)
