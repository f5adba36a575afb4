"""Occupancy-grid bit packing (reference: models/csrc/raymarching.cu:122-161).

The density grid is thresholded to one bit per cell, 8 cells per byte,
little-endian within a byte (bit i of byte n = cell 8n+i), so
`density_bitfield[idx//8] & (1 << (idx % 8))` lookups behave like the
reference's (raymarching.cu:220). The flat cell ordering *within* a
cascade is linear x-major (models/occupancy.py), not the reference's
Morton order — the layout is internal to this repo, and both sides of
it (packbits here, occupancy_lookup in ops/ray_march.py) use the same
linear indexing; ops/morton.py provides Morton codes for parity tests.
"""
import jax.numpy as jnp
import numpy as np


def packbits(density_grid: jnp.ndarray, density_threshold) -> jnp.ndarray:
    """(..., 8*N) float densities -> (..., N) uint8 bitfield (flattened)."""
    occ = (density_grid.reshape(-1) > density_threshold).astype(jnp.uint8)
    occ = occ.reshape(-1, 8)
    # weight-sum instead of `occ << arange(8)`: dynamic vector shifts
    # lower ~1000x slower than multiplies on TPU (see unpack_bit note)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(occ * weights, axis=-1, dtype=jnp.uint8)


def unpack_bit(bitfield: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather occupancy bits for flat cell indices `idx` from a uint8 bitfield.

    Perf note (measured on v5e): the scalar gather costs ~8 ns per
    index regardless of width — the shift/mask afterwards is free. Hot
    paths should therefore minimize the number of gather *indices*
    (see ops/ray_march.py block-march), not the bytes per index.
    """
    byte = bitfield[idx >> 3]
    bit = (byte >> (idx & 7).astype(jnp.uint8)) & jnp.uint8(1)
    return bit.astype(jnp.bool_)
