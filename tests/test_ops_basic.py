"""Unit tests for morton / packbits / trunc_exp / ray-AABB ops with
golden values (SURVEY.md §4 test strategy, item 1)."""
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.ops import (
    morton3d,
    morton3d_invert,
    packbits,
    ray_aabb_intersect,
    trunc_exp,
    unpack_bit,
)


def _morton_ref(x, y, z):
    """Bit-by-bit Morton reference."""
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip_and_golden(rng):
    coords = rng.integers(0, 128, size=(256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expect = np.array([_morton_ref(*c) for c in coords])
    np.testing.assert_array_equal(codes, expect)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_packbits_layout(rng):
    grid = rng.standard_normal(64).astype(np.float32)
    bf = np.asarray(packbits(jnp.asarray(grid), 0.0))
    # little-endian within byte (raymarching.cu:136-137)
    for n in range(8):
        for i in range(8):
            expect = 1 if grid[8 * n + i] > 0.0 else 0
            assert (bf[n] >> i) & 1 == expect
    # unpack_bit agrees
    idx = jnp.arange(64)
    bits = np.asarray(unpack_bit(jnp.asarray(bf), idx))
    np.testing.assert_array_equal(bits, grid > 0.0)


def test_trunc_exp_forward_backward():
    x = jnp.array([-20.0, -1.0, 0.0, 1.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    # backward clamps the exponent to [-15, 15] (custom_functions.py:173)
    expect = np.exp(np.clip(np.asarray(x), -15.0, 15.0))
    np.testing.assert_allclose(g, expect, rtol=1e-5)


def test_ray_aabb_golden():
    center = jnp.zeros(3)
    half = jnp.full(3, 0.5)
    rays_o = jnp.array([
        [0.0, 0.0, -2.0],   # hits front face
        [0.0, 0.0, 0.0],    # starts inside
        [2.0, 0.0, -2.0],   # misses
        [0.0, 0.0, 2.0],    # box behind the ray
    ])
    rays_d = jnp.array([
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 1.0],
    ])
    t = np.asarray(ray_aabb_intersect(rays_o, rays_d, center, half))
    np.testing.assert_allclose(t[0], [1.5, 2.5], atol=1e-6)
    np.testing.assert_allclose(t[1], [0.0, 0.5], atol=1e-6)  # near clamped to 0
    np.testing.assert_allclose(t[2], [-1.0, -1.0])
    np.testing.assert_allclose(t[3], [-1.0, -1.0])


def test_ray_aabb_matches_bruteforce(rng):
    rays_o = jnp.asarray(rng.uniform(-2, 2, (512, 3)).astype(np.float32))
    d = rng.standard_normal((512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)
    t = np.asarray(ray_aabb_intersect(rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5)))
    # verify: points at returned t are on/in the box boundary
    hit = t[:, 0] >= 0
    pts_near = np.asarray(rays_o)[hit] + t[hit, :1] * d[hit]
    pts_far = np.asarray(rays_o)[hit] + t[hit, 1:2] * d[hit]
    assert np.all(np.abs(pts_near) <= 0.5 + 1e-4)
    assert np.all(np.abs(pts_far) <= 0.5 + 1e-4)
    assert np.all(np.max(np.abs(pts_far), axis=-1) >= 0.5 - 1e-4)
