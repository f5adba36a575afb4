"""Multiresolution hash-grid encoding (Instant-NGP) in pure JAX.

TPU-native replacement for tiny-cuda-nn's `tcnn.Encoding` grid
(reference: models/ngp_mt.py:70-82 configures L=16 levels, F=2
features, T=2^19 table, N_min=16, growth b, linear interpolation).
Follows the tcnn Grid algorithm: per level, resolution
ceil(N_min * b^l - 1) + 1, corner positions floor(x*scale + 0.5),
dense indexing when the level fits in the table and the
{1, 2654435761, 805459861} XOR-multiply spatial hash otherwise.

Forward is 8 gathers + trilinear blend per level; backward is XLA's
native scatter-add into the table (the equivalent of tcnn's atomic
gradient accumulation). A Pallas-fused variant can plug in behind the
same interface (ops/pallas/).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = (1, 2654435761, 805459861)

import os as _os

_DEDUPE_SCATTER_ENABLED = _os.environ.get("NCNERF_DEDUPE_SCATTER", "0") == "1"


class HashGridSpec(NamedTuple):
    """Static per-level geometry of the hash grid."""
    n_levels: int
    n_features: int
    table_size: int              # per-level hash table capacity (2^log2_T)
    base_res: int
    per_level_scale: float
    scales: Sequence[float]      # tcnn 'scale' per level
    resolutions: Sequence[int]   # cells per axis per level
    level_offsets: Sequence[int] # row offset of each level in the table
    total_rows: int
    dense: Sequence[bool]        # dense indexing (no hashing) per level

    @staticmethod
    def create(
        n_levels: int = 16,
        n_features: int = 2,
        log2_table_size: int = 19,
        base_res: int = 16,
        per_level_scale: float = 1.3819,
    ) -> "HashGridSpec":
        T = 1 << log2_table_size
        scales, resolutions, offsets, dense = [], [], [], []
        off = 0
        for l in range(n_levels):
            # tcnn grid.h: scale = exp2(l*log2(b))*N_min - 1; res = ceil(scale)+1
            s = math.exp2(l * math.log2(per_level_scale)) * base_res - 1.0
            res = int(math.ceil(s)) + 1
            n_cells = res ** 3
            use_dense = n_cells <= T
            rows = n_cells if use_dense else T
            # tcnn aligns level sizes to multiples of 8
            rows = (rows + 7) // 8 * 8
            scales.append(s)
            resolutions.append(res)
            offsets.append(off)
            dense.append(use_dense)
            off += rows
        return HashGridSpec(
            n_levels=n_levels, n_features=n_features, table_size=T,
            base_res=base_res, per_level_scale=per_level_scale,
            scales=tuple(scales), resolutions=tuple(resolutions),
            level_offsets=tuple(offsets), total_rows=off, dense=tuple(dense),
        )


def init_hash_table(key, spec: HashGridSpec, dtype=jnp.float32):
    """tcnn default init: uniform in [-1e-4, 1e-4]."""
    return jax.random.uniform(
        key, (spec.total_rows, spec.n_features), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _corner_index(ix, iy, iz, res: int, dense: bool, table_size: int):
    """Row index of an integer grid corner at one level."""
    if dense:
        return (ix * res + iy) * res + iz
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[0])
        ^ iy.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[1])
        ^ iz.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[2])
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _level_corners(x, spec: HashGridSpec, l: int):
    """Corner rows (M, 8), weights (M, 8) and fractional coords for level l."""
    s = spec.scales[l]
    res = spec.resolutions[l]
    # tcnn: pos = x*scale + 0.5, corner = floor(pos), w = frac(pos)
    pos = x * s + 0.5
    p0 = jnp.floor(pos)
    w = pos - p0
    p0 = p0.astype(jnp.int32)
    rows, wts = [], []
    for c in range(8):
        cx, cy, cz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        ix = jnp.clip(p0[:, 0] + cx, 0, res - 1)
        iy = jnp.clip(p0[:, 1] + cy, 0, res - 1)
        iz = jnp.clip(p0[:, 2] + cz, 0, res - 1)
        rows.append(spec.level_offsets[l] + _corner_index(
            ix, iy, iz, res, spec.dense[l], spec.table_size))
        wx = w[:, 0] if cx else 1.0 - w[:, 0]
        wy = w[:, 1] if cy else 1.0 - w[:, 1]
        wz = w[:, 2] if cz else 1.0 - w[:, 2]
        wts.append(wx * wy * wz)
    return jnp.stack(rows, 1), jnp.stack(wts, 1), w


def _hash_encode_fwd_impl(table, x, spec: HashGridSpec):
    x = x.astype(jnp.float32)
    feats = []
    for l in range(spec.n_levels):
        rows, wts, _ = _level_corners(x, spec, l)
        gathered = table[rows]                           # (M, 8, F) row gather
        feats.append(jnp.einsum("mc,mcf->mf", wts, gathered))
    return jnp.concatenate(feats, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_vjp(table, x, spec: HashGridSpec, need_dx: bool = False):
    """Multiresolution hash encode with a TPU-shaped custom backward.

    Why custom: XLA's autodiff backward scatters the table gradient as
    (M*8, F=2)-row scatter-adds, which on TPU are ~10x slower than 1-D
    scatters (trailing-dim-2 layouts pad to 128 lanes and the scatter
    serializes); the full-field backward cost was ~1.3 s per 262k
    samples. This VJP recomputes corner indices/weights in the backward
    (cheap VPU math) and emits exactly one 1-D (M*8,) scatter-add per
    level per feature column — the fast path — plus an optional
    analytic position gradient (only needed when camera extrinsics are
    optimized; reference: models/custom_functions.py:104-112).
    """
    return _hash_encode_fwd_impl(table, x, spec)


def _hash_vjp_fwd(table, x, spec, need_dx):
    return _hash_encode_fwd_impl(table, x, spec), (table, x)


def _run_dedupe_scatter(col, rows, vals, budget):
    """Scatter-add with consecutive-run reduction.

    Ray-marched samples are spatially coherent: at coarse levels many
    consecutive samples share a cell, so their gradient contributions
    can be pre-reduced with streaming scans before the (latency-bound)
    scatter — ~3x faster on chip at run length 8. Runs are compacted
    into a half-size buffer; if the input has no run structure (e.g.
    occupancy-grid updates on random cells) the run count overflows the
    budget and a lax.cond falls back to the direct scatter, so the
    result is always exact.
    """
    K = rows.shape[0]

    def direct(_):
        return col.at[rows].add(vals)

    def dedupe(_):
        new = jnp.concatenate(
            [jnp.ones((1,), bool), rows[1:] != rows[:-1]])
        last = jnp.concatenate([new[1:], jnp.ones((1,), bool)])
        pos = jnp.cumsum(new.astype(jnp.int32)) - 1      # run id
        # segmented (per-run) inclusive cumsum: resets at run starts, so
        # run totals read directly at run ends without the catastrophic
        # cancellation of global-cumsum differences
        def op(a, b):
            av, an = a
            bv, bn = b
            return jnp.where(bn, bv, av + bv), an | bn
        run_csum, _ = jax.lax.associative_scan(op, (vals, new))
        slot = jnp.where(last, jnp.minimum(pos, budget), budget)
        rows_c = jnp.zeros((budget + 1,), rows.dtype).at[slot].set(
            rows, mode="drop", unique_indices=True)[:budget]
        totals_c = jnp.zeros((budget + 1,), vals.dtype).at[slot].set(
            run_csum, mode="drop", unique_indices=True)[:budget]
        n_runs = pos[-1] + 1
        valid = jnp.arange(budget) < jnp.minimum(n_runs, budget)
        return col.at[jnp.where(valid, rows_c, 0)].add(
            jnp.where(valid, totals_c, 0.0))

    new = jnp.concatenate([jnp.ones((1,), bool), rows[1:] != rows[:-1]])
    n_runs = jnp.sum(new.astype(jnp.int32))
    return jax.lax.cond(n_runs <= budget, dedupe, direct, 0)


def _hash_vjp_bwd(spec, need_dx, res, g):
    table, x = res
    x = x.astype(jnp.float32)
    M = x.shape[0]
    F = spec.n_features
    n_rows = table.shape[0]
    # per-feature 1-D accumulation columns
    d_cols = [jnp.zeros((n_rows,), table.dtype) for _ in range(F)]
    dx = jnp.zeros((M, 3), jnp.float32) if need_dx else None
    for l in range(spec.n_levels):
        rows, wts, w = _level_corners(x, spec, l)
        g_l = g[:, l * F:(l + 1) * F]                    # (M, F)
        # corner-major flattening: consecutive elements are consecutive
        # samples of the same corner -> run structure for dedupe
        rows_cm = rows.T.reshape(-1)
        # NOTE: the run-dedupe path (_run_dedupe_scatter) measured 3x
        # faster in isolation but regressed the full train step (its
        # compaction .set scatters don't vectorize in the fused graph);
        # kept available behind the env toggle for future kernels.
        use_dedupe = (
            spec.resolutions[l] <= 256 and _DEDUPE_SCATTER_ENABLED
        )
        for f in range(F):
            vals_cm = (wts * g_l[:, f:f + 1]).T.reshape(-1)  # (M*8,)
            if use_dedupe:
                d_cols[f] = _run_dedupe_scatter(
                    d_cols[f], rows_cm, vals_cm, budget=M * 4)
            else:
                d_cols[f] = d_cols[f].at[rows_cm].add(vals_cm)
        if need_dx:
            tv = table[rows]                             # (M, 8, F)
            gdot = jnp.einsum("mcf,mf->mc", tv, g_l)     # (M, 8)
            s = spec.scales[l]
            for a in range(3):
                # d w_c / d x_a = +-(product of the other two axis weights) * s
                o1, o2 = [b for b in range(3) if b != a]
                dwc = []
                for c in range(8):
                    ca, c1, c2 = (c >> (2 - a)) & 1, (c >> (2 - o1)) & 1, (c >> (2 - o2)) & 1
                    w1 = w[:, o1] if c1 else 1.0 - w[:, o1]
                    w2 = w[:, o2] if c2 else 1.0 - w[:, o2]
                    sign = 1.0 if ca else -1.0
                    dwc.append(sign * w1 * w2)
                dwc = jnp.stack(dwc, 1) * s              # (M, 8)
                dx = dx.at[:, a].add(jnp.sum(dwc * gdot, axis=1))
    d_table = jnp.stack(d_cols, axis=-1)
    return d_table, (dx if need_dx else jnp.zeros_like(x))


hash_encode_vjp.defvjp(_hash_vjp_fwd, _hash_vjp_bwd)


def hash_encode(table, x, spec: HashGridSpec, compute_dtype=jnp.float32,
                need_dx: bool = False):
    """Encode positions through all levels (custom-VJP fast path).

    Args:
      table: (total_rows, F) parameters.
      x: (M, 3) positions normalized to [0, 1]^3
        (reference: models/ngp_mt.py:166 normalizes before encoding).
      need_dx: compute gradients w.r.t. positions in the backward
        (needed only when optimizing camera extrinsics).
    Returns:
      (M, L*F) features, concatenated level-major.
    """
    out = hash_encode_vjp(table, x, spec, need_dx)
    return out.astype(compute_dtype)


def hash_encode_reference_np(table, x, spec: HashGridSpec):
    """NumPy oracle for tests (same math, scalar-explicit)."""
    table = np.asarray(table)
    x = np.asarray(x)
    M = x.shape[0]
    out = np.zeros((M, spec.n_levels * spec.n_features), np.float32)
    for l in range(spec.n_levels):
        s, res = spec.scales[l], spec.resolutions[l]
        pos = x * s + 0.5
        p0 = np.floor(pos).astype(np.int64)
        w = pos - p0
        acc = np.zeros((M, spec.n_features), np.float32)
        for c in range(8):
            cx, cy, cz = (c >> 2) & 1, (c >> 1) & 1, c & 1
            ii = np.clip(p0 + [cx, cy, cz], 0, res - 1)
            if spec.dense[l]:
                idx = (ii[:, 0] * res + ii[:, 1]) * res + ii[:, 2]
            else:
                h = (
                    ii[:, 0].astype(np.uint32) * np.uint32(_HASH_PRIMES[0])
                    ^ ii[:, 1].astype(np.uint32) * np.uint32(_HASH_PRIMES[1])
                    ^ ii[:, 2].astype(np.uint32) * np.uint32(_HASH_PRIMES[2])
                )
                idx = h & np.uint32(spec.table_size - 1)
            wx = w[:, 0] if cx else 1 - w[:, 0]
            wy = w[:, 1] if cy else 1 - w[:, 1]
            wz = w[:, 2] if cz else 1 - w[:, 2]
            acc += (wx * wy * wz)[:, None] * table[spec.level_offsets[l] + idx]
        out[:, l * spec.n_features:(l + 1) * spec.n_features] = acc
    return out
