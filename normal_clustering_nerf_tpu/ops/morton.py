"""3D Morton (Z-order) encode/decode as vectorized int32 bit-twiddling.

TPU-native equivalent of the reference CUDA kernels
(reference: models/csrc/raymarching.cu:35-119). Used for occupancy-grid
cell indexing so the bitfield layout is bit-compatible with the
reference's, which keeps golden-value tests meaningful.
"""
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    # reference: models/csrc/raymarching.cu:35-42 (__expand_bits)
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int cell coords -> (N,) int32 Morton codes.

    reference: models/csrc/raymarching.cu:44-50 (__morton3D)
    """
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    # reference: models/csrc/raymarching.cu:52-60 (__morton3D_invert)
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """(N,) Morton codes -> (N, 3) int32 cell coords."""
    idx = indices.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(idx >> 0), _compact_bits(idx >> 1), _compact_bits(idx >> 2)],
        axis=-1,
    ).astype(jnp.int32)
