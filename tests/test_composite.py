"""Compositing parity: JAX autodiff of the dense masked formulation vs
the reference's hand-derived CUDA gradient formula
(SURVEY.md §4 strategy item 2; volumerendering.cu:298-364)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normal_clustering_nerf_tpu.ops import (
    composite_rays,
    composite_rays_compact,
    composite_reference_grads,
)


def _random_batch(rng, N=16, K=32, C=5):
    sigmas = jnp.asarray(rng.uniform(0.0, 30.0, (N, K)).astype(np.float32))
    raws = jnp.asarray(rng.uniform(0.0, 1.0, (N, K, C)).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.001, 0.02, (N, K)).astype(np.float32))
    ts = jnp.cumsum(deltas, axis=-1) + 0.1
    n_valid = rng.integers(0, K + 1, (N,))
    valid = jnp.asarray(np.arange(K)[None, :] < n_valid[:, None])
    return sigmas, raws, deltas, ts, valid


def _scan_reference_forward(sigmas, raws, deltas, ts, valid, T_thr):
    """Literal python transcription of composite_train_multi_fw_kernel
    (volumerendering.cu:98-136) as the forward oracle."""
    N, K, C = raws.shape
    opacity = np.zeros(N)
    depth = np.zeros(N)
    rend = np.zeros((N, C))
    ws = np.zeros((N, K))
    total = np.zeros(N, dtype=np.int64)
    for n in range(N):
        T = 1.0
        s = 0
        n_samples = int(valid[n].sum())
        while s < n_samples:
            a = 1.0 - np.exp(-sigmas[n, s] * deltas[n, s])
            w = a * T
            rend[n] += w * raws[n, s]
            depth[n] += w * ts[n, s]
            opacity[n] += w
            ws[n, s] = w
            T *= 1.0 - a
            if T <= T_thr:
                break
            s += 1
        total[n] = s
    return opacity, depth, rend, ws, total


def test_forward_matches_cuda_scan(rng):
    sigmas, raws, deltas, ts, valid = _random_batch(rng)
    T_thr = 1e-4
    out = composite_rays(sigmas, raws, deltas, ts, valid, T_thr)
    o, d, r, w, tot = _scan_reference_forward(
        np.asarray(sigmas), np.asarray(raws), np.asarray(deltas),
        np.asarray(ts), np.asarray(valid), T_thr,
    )
    np.testing.assert_allclose(out["opacity"], o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["depth"], d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["rend"], r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["ws"], w, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out["vr_samples"], tot)


def test_autodiff_matches_reference_backward(rng):
    sigmas, raws, deltas, ts, valid = _random_batch(rng, N=8, K=24, C=4)
    T_thr = 1e-4
    N, K, C = raws.shape
    dL_dopacity = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    dL_ddepth = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    dL_drend = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    dL_dws = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))

    def scalar_loss(sig, raw):
        out = composite_rays(sig, raw, deltas, ts, valid, T_thr)
        return (
            jnp.sum(out["opacity"] * dL_dopacity)
            + jnp.sum(out["depth"] * dL_ddepth)
            + jnp.sum(out["rend"] * dL_drend)
            + jnp.sum(out["ws"] * dL_dws)
        )

    g_sig, g_raw = jax.grad(scalar_loss, argnums=(0, 1))(sigmas, raws)
    ref_sig, ref_raw = composite_reference_grads(
        sigmas, raws, deltas, ts, valid, T_thr,
        dL_dopacity, dL_ddepth, dL_drend, dL_dws,
    )
    np.testing.assert_allclose(g_sig, ref_sig, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_raw, ref_raw, rtol=1e-4, atol=1e-5)


def test_compact_matches_dense(rng):
    sigmas, raws, deltas, ts, valid = _random_batch(rng, N=12, K=16, C=3)
    N, K, C = raws.shape
    dense = composite_rays(sigmas, raws, deltas, ts, valid, 1e-4)

    # flatten valid samples ray-major into a compact buffer
    v = np.asarray(valid)
    counts = v.sum(1).astype(np.int32)
    B = int(counts.sum()) + 7  # some slack slots
    ray_id = np.full(B, N - 1, np.int32)
    sig_c = np.zeros(B, np.float32)
    raw_c = np.zeros((B, C), np.float32)
    dt_c = np.zeros(B, np.float32)
    t_c = np.zeros(B, np.float32)
    val_c = np.zeros(B, bool)
    pos = 0
    for n in range(N):
        for s in range(counts[n]):
            ray_id[pos] = n
            sig_c[pos] = sigmas[n, s]
            raw_c[pos] = raws[n, s]
            dt_c[pos] = deltas[n, s]
            t_c[pos] = ts[n, s]
            val_c[pos] = True
            pos += 1
    start = np.cumsum(counts) - counts

    out = composite_rays_compact(
        jnp.asarray(sig_c), jnp.asarray(raw_c), jnp.asarray(dt_c),
        jnp.asarray(t_c), jnp.asarray(ray_id), jnp.asarray(start),
        jnp.asarray(val_c), N, 1e-4,
    )
    np.testing.assert_allclose(out["opacity"], dense["opacity"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["depth"], dense["depth"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["rend"], dense["rend"], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out["vr_samples"], dense["vr_samples"])
