"""Occupancy-grid bit packing (reference: models/csrc/raymarching.cu:122-161).

The density grid is thresholded to one bit per cell, 8 cells per byte,
little-endian within a byte (bit i of byte n = cell 8n+i), matching the
reference layout so `density_bitfield[idx//8] & (1 << (idx % 8))`
lookups behave identically (raymarching.cu:220).
"""
import jax.numpy as jnp


def packbits(density_grid: jnp.ndarray, density_threshold) -> jnp.ndarray:
    """(..., 8*N) float densities -> (..., N) uint8 bitfield (flattened)."""
    occ = (density_grid.reshape(-1) > density_threshold).astype(jnp.uint8)
    occ = occ.reshape(-1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(occ << shifts, axis=-1).astype(jnp.uint8)


def unpack_bit(bitfield: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather occupancy bits for flat cell indices `idx` from a uint8 bitfield."""
    byte = bitfield[idx >> 3]
    bit = (byte >> (idx & 7).astype(jnp.uint8)) & jnp.uint8(1)
    return bit.astype(jnp.bool_)
