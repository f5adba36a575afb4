"""Segmented scan helpers for flat ray-major sample buffers.

The TPU replacement for the reference's per-segment thrust scans
(reference: models/csrc/losses.cu:8-41, volumerendering.cu:211-215):
a global cumsum minus a per-segment base gathered at segment starts.
"""
import jax.numpy as jnp


def segment_cumsum(x, seg_id, seg_start):
    """Inclusive and exclusive cumulative sums within ray-major segments.

    Args:
      x: (B,) values (invalid slots must be 0).
      seg_id: (B,) int32 owning segment, sorted ascending.
      seg_start: (N,) int32 first slot of each segment.

    Returns: (inclusive (B,), exclusive (B,)).
    """
    csum = jnp.cumsum(x, axis=0)
    start_safe = jnp.clip(seg_start - 1, 0, x.shape[0] - 1)
    base = jnp.where(seg_start > 0, csum[start_safe], jnp.zeros_like(csum[:1][0]))
    incl = csum - base[seg_id]
    return incl, incl - x
