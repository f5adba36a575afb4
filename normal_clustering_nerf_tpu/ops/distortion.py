"""Mip-NeRF-360 distortion loss (DVGO-v2 formulation) on compact segments.

TPU-native equivalent of the reference CUDA op
(reference: models/csrc/losses.cu:62-107 forward, :110-140 backward).
Per ray: loss = sum_s 2*(wts_incl_s * ws_excl_s - ws_incl_s * wts_excl_s)
               + (1/3) * w_s^2 * delta_s
with ws/wts prefix scans per ray segment. The forward here is plain
cumsum/segment-sum JAX, so autodiff produces the gradient — which is
analytically the reference's hand-derived closed form
(losses.cu:131-138); `distortion_reference_grad` implements that form
directly as the test oracle.
"""
import jax
import jax.numpy as jnp

from .segops import segment_cumsum


def distortion_loss(ws, deltas, ts, ray_id, ray_start, valid, n_rays):
    """Per-ray distortion loss over flat ray-major samples.

    Args:
      ws: (B,) sample weights; deltas/ts: (B,); valid: (B,) bool.
      ray_id/ray_start: segment bookkeeping from `march_rays_train`.
    Returns: (n_rays,) per-ray loss.
    """
    w = jnp.where(valid, ws, 0.0)
    wts = w * ts
    ws_in, ws_ex = segment_cumsum(w, ray_id, ray_start)
    wts_in, wts_ex = segment_cumsum(wts, ray_id, ray_start)
    per_sample = 2.0 * (wts_in * ws_ex - ws_in * wts_ex) + (1.0 / 3.0) * w * w * deltas
    per_sample = jnp.where(valid, per_sample, 0.0)
    return jax.ops.segment_sum(per_sample, ray_id, num_segments=n_rays)


def distortion_loss_dense(ws, deltas, ts, valid):
    """Distortion loss on the dense (N, K) per-ray layout.

    Same math as `distortion_loss` (reference: models/csrc/losses.cu:
    62-107) with the per-ray segment scans degenerating to row-wise
    cumsums — no segment bookkeeping, no gathers.

    Returns: (N,) per-ray loss.
    """
    w = jnp.where(valid, ws, 0.0)
    wts = w * ts
    ws_in = jnp.cumsum(w, axis=-1)
    wts_in = jnp.cumsum(wts, axis=-1)
    ws_ex = ws_in - w
    wts_ex = wts_in - wts
    per_sample = 2.0 * (wts_in * ws_ex - ws_in * wts_ex) + (1.0 / 3.0) * w * w * deltas
    return jnp.sum(jnp.where(valid, per_sample, 0.0), axis=-1)


def distortion_reference_grad(dL_dloss, ws, deltas, ts, ray_id, ray_start, valid, n_rays):
    """Direct implementation of losses.cu:110-140 (test oracle).

    Returns dL_dws: (B,).
    """
    w = jnp.where(valid, ws, 0.0)
    wts = w * ts
    ws_in, _ = segment_cumsum(w, ray_id, ray_start)
    wts_in, _ = segment_cumsum(wts, ray_id, ray_start)
    ws_sum = jax.ops.segment_sum(w, ray_id, num_segments=n_rays)[ray_id]
    wts_sum = jax.ops.segment_sum(wts, ray_id, num_segments=n_rays)[ray_id]

    is_first = jnp.arange(ws.shape[0], dtype=jnp.int32) == ray_start[ray_id]
    ws_in_prev = ws_in - w
    wts_in_prev = wts_in - wts
    head = jnp.where(is_first, 0.0, ts * ws_in_prev - wts_in_prev)
    tail = wts_sum - wts_in - ts * (ws_sum - ws_in)
    g = dL_dloss[ray_id] * 2.0 * (head + tail)
    g = g + dL_dloss[ray_id] * (2.0 / 3.0) * w * deltas
    return jnp.where(valid, g, 0.0)
