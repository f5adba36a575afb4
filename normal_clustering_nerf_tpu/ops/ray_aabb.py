"""Ray / axis-aligned-box intersection (slab test), vectorized.

TPU-native equivalent of the reference CUDA kernel
(reference: models/csrc/intersection.cu:5-100). The main render path
only ever intersects the single scene cube (models/rendering.py:26-27,
max_hits=1), so this implements the one-box fast path with the same
output conventions: t1 clamped to 0, (-1, -1) when there is no hit.
"""
import jax.numpy as jnp


def ray_aabb_intersect(rays_o, rays_d, center, half_size):
    """Slab test of N rays against one AABB.

    Args:
      rays_o: (N, 3) origins.
      rays_d: (N, 3) directions (not necessarily unit).
      center: (3,) box center.
      half_size: (3,) box half extents.

    Returns:
      hits_t: (N, 2) [t_near, t_far]; (-1, -1) if the ray misses
        (matching intersection.cu:20,94: miss iff t1 > t2 or t2 <= 0).
    """
    inv_d = 1.0 / rays_d
    t_lo = (center - half_size - rays_o) * inv_d
    t_hi = (center + half_size - rays_o) * inv_d
    t1 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t2 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hit = (t1 <= t2) & (t2 > 0)
    near = jnp.maximum(t1, 0.0)
    return jnp.where(
        hit[:, None],
        jnp.stack([near, t2], axis=-1),
        jnp.full_like(jnp.stack([t1, t2], axis=-1), -1.0),
    )


def ray_sphere_intersect(rays_o, rays_d, center, radius):
    """Ray/sphere intersection via the quadratic solve.

    TPU equivalent of the reference's sphere kernel (reference:
    models/csrc/intersection.cu:103-197) — dead code in the reference's
    main path but part of its public op surface
    (models/custom_functions.py:32-52). Same conventions as
    `ray_aabb_intersect`: (N, 2) [t_near, t_far], (-1, -1) on miss,
    near clamped to 0.

    Args:
      rays_o/rays_d: (N, 3); center: (3,); radius: scalar.
    """
    oc = rays_o - center
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = 2.0 * jnp.sum(oc * rays_d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    hit = ok & (t2 > 0)
    near = jnp.maximum(t1, 0.0)
    out = jnp.stack([near, t2], axis=-1)
    return jnp.where(hit[:, None], out, -jnp.ones_like(out))
