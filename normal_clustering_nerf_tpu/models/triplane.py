"""Triplane + coarse-grid factorized field — the TPU-fast encoding.

A TPU-first alternative to the multiresolution hash grid (reference:
models/ngp_mt.py:70-82 instantiates a tcnn 16-level hash encoding).
Motivation, measured on v5e: XLA gathers cost ~7-8 ns per INDEX
regardless of fetched row width, so the hash encoding's 16 row
gathers per sample dominate the whole train step (33 ms forward at
262k samples). This encoding needs **4 gather indices per sample**
instead of 16:

  * three axis-aligned feature planes (xy, xz, yz) at `plane_res`^2
    vertices x `plane_feats` features, bilinearly interpolated — one
    row gather each via a 2D brick layout (4x4-vertex bricks on a
    stride-3 grid: any bilinear cell's 4 corners live in one brick;
    16 verts x 8 feats = 128 floats = exactly one TPU lane row);
  * one dense coarse 3D grid (`grid3d_res`^3 x `grid3d_feats`,
    trilinear) via the 3D brick layout of models/brick_hash.py — the
    low-frequency volumetric component that resolves the axis
    aliasing inherent to pure triplanes.

Factorized plane representations match NGP quality on bounded indoor
scenes (TensoRF, arXiv 2203.09517; EG3D, arXiv 2112.07945), and
axis-aligned planes are a natural basis for Manhattan-world scenes,
this framework's headline domain.

Backward: one aligned row scatter-add per plane + one for the grid
(4 scatter indices per sample vs the hash layout's 16).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PLANES = ((0, 1), (0, 2), (1, 2))

# Row-lane layout version. v1: slot-major lanes (s*F + f). v2: the
# feature-major lanes (f*S + s) that _slot_fold assumes. Param SHAPES
# are identical across versions, so a restore of a v1 checkpoint would
# silently decode scrambled features without this tag — checkpoints
# record it and training/checkpoints.py permutes v1 rows on restore.
TRIPLANE_LAYOUT_VERSION = 2


def convert_rows_slot_to_feature_major(rows, n_slots: int):
    """One-time lane permutation: (rows, F*S) slot-major (lane s*F+f)
    -> feature-major (lane f*S+s)."""
    R, FS = rows.shape
    F = FS // n_slots
    return (np.asarray(rows).reshape(R, n_slots, F)
            .transpose(0, 2, 1).reshape(R, FS))


def convert_triplane_params_v1_to_v2(tp_params):
    """Permute a v1 (slot-major) triplane param dict in place-free form."""
    out = dict(tp_params)
    out["planes"] = np.stack([
        convert_rows_slot_to_feature_major(p, 16)
        for p in np.asarray(tp_params["planes"])])
    out["grid3d"] = convert_rows_slot_to_feature_major(
        tp_params["grid3d"], 64)
    return out


class TriplaneSpec(NamedTuple):
    plane_res: int       # vertices per plane axis
    plane_feats: int     # features per plane sample (16*F = 128 lanes)
    grid3d_res: int      # coarse 3D grid vertices per axis
    grid3d_feats: int

    @staticmethod
    def create(plane_res=512, plane_feats=8, grid3d_res=64, grid3d_feats=4):
        assert 16 * plane_feats == 128, "plane row must be one lane row"
        return TriplaneSpec(plane_res, plane_feats, grid3d_res, grid3d_feats)

    @property
    def nb2(self) -> int:
        return (self.plane_res - 2) // 3 + 1   # 2D bricks per axis

    @property
    def nb3(self) -> int:
        return (self.grid3d_res - 1) // 3 + 1  # 3D bricks per axis

    @property
    def out_dim(self) -> int:
        return 3 * self.plane_feats + self.grid3d_feats

    def param_shapes(self):
        return {
            "planes": (3, self.nb2 ** 2, 128),
            "grid3d": (self.nb3 ** 3, 64 * self.grid3d_feats),
        }


def init_triplane(key, spec: TriplaneSpec, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    shapes = spec.param_shapes()
    return {
        "planes": jax.random.uniform(k1, shapes["planes"], dtype,
                                     minval=-1e-4, maxval=1e-4),
        "grid3d": jax.random.uniform(k2, shapes["grid3d"], dtype,
                                     minval=-1e-4, maxval=1e-4),
    }


def _axis_w4(pos):
    """Scalar axis position -> (p0, brick, w4, dw4) with 4-slot one-hot
    weights (the 2D/3D brick interpolation primitive).

    pos: (M,) continuous vertex coordinate in [0, res-1].
    """
    p0 = jnp.floor(pos)
    f = pos - p0
    p0 = p0.astype(jnp.int32)
    b = p0 // 3
    l0 = p0 - 3 * b
    slots = jnp.arange(4, dtype=jnp.int32)
    oh0 = (l0[:, None] == slots).astype(jnp.float32)
    oh1 = ((l0 + 1)[:, None] == slots).astype(jnp.float32)
    w4 = (1.0 - f)[:, None] * oh0 + f[:, None] * oh1
    dw4 = oh1 - oh0
    return b, w4, dw4


def _plane_geometry(x2, spec: TriplaneSpec):
    """(M, 2) in [0,1]^2 -> (row ids (M,), w16 (M,16), (dwu16, dwv16))."""
    R = spec.plane_res
    pos = jnp.clip(x2 * (R - 1), 0.0, R - 2 + 1e-6)
    bu, wu, dwu = _axis_w4(pos[:, 0])
    bv, wv, dwv = _axis_w4(pos[:, 1])
    row = bu * spec.nb2 + bv
    w16 = (wu[:, :, None] * wv[:, None, :]).reshape(-1, 16)
    dwu16 = (dwu[:, :, None] * wv[:, None, :]).reshape(-1, 16)
    dwv16 = (wu[:, :, None] * dwv[:, None, :]).reshape(-1, 16)
    return row, w16, (dwu16, dwv16)


def _grid_geometry(x, spec: TriplaneSpec):
    """(M, 3) in [0,1]^3 -> (row ids, w64 (M,64), per-axis (dw64 x3))."""
    R = spec.grid3d_res
    pos = jnp.clip(x * (R - 1), 0.0, R - 2 + 1e-6)
    bx, wx, dwx = _axis_w4(pos[:, 0])
    by, wy, dwy = _axis_w4(pos[:, 1])
    bz, wz, dwz = _axis_w4(pos[:, 2])
    row = (bx * spec.nb3 + by) * spec.nb3 + bz
    def outer(a, b, c):
        return (a[:, :, None, None] * b[:, None, :, None]
                * c[:, None, None, :]).reshape(-1, 64)
    return row, outer(wx, wy, wz), (
        outer(dwx, wy, wz), outer(wx, dwy, wz), outer(wx, wy, dwz))


def _slot_fold(rows, w):
    """Fold gathered FEATURE-MAJOR rows (M, F*S) with slot weights
    (M, S) into (M, F) features: out[m, f] = sum_s rows[m, f*S+s]*w[m, s].

    Two deliberate choices, both from the r4 train-step trace:
      * broadcast-multiply + reduce (not the old repeat(w, F) * rows +
        constant fold-matmul, which materialized three (M, S*F)
        intermediates plus layout copies — ~4.8 ms/step at M=262k);
      * feature-major row layout, so the 3D view is (M, F, S) with the
        reduced slot axis minor. The slot-major view (M, S, F) put a
        2-8-wide feature axis in TPU lanes (padded up to 128) and XLA
        inserted ~4 ms/step of pure layout copies around it.
    """
    M, FS = rows.shape
    S = w.shape[1]
    w = w.astype(rows.dtype)  # bf16 tables: multiply in bf16, accum f32
    return jnp.sum(rows.reshape(M, FS // S, S) * w[:, None, :], axis=2,
                   dtype=jnp.float32)


def _encode_impl(params, x, spec: TriplaneSpec, table_dtype=jnp.float32):
    # bf16 table rows halve the gather + layout-copy HBM traffic of the
    # encode (the r5 profile's #2 cost block after the backward
    # scatters); the cast of the full table is one cheap streaming pass
    # and the fold accumulates in f32. Master weights stay f32 (the
    # reference's tcnn runs fp16 tables in production, ngp_mt.py:70-82).
    planes = params["planes"].astype(table_dtype)
    grid3d = params["grid3d"].astype(table_dtype)
    feats = []
    for pi, (a, b) in enumerate(_PLANES):
        row, w16, _ = _plane_geometry(x[:, (a, b)], spec)
        rows = planes[pi][row]                              # (M, 128)
        feats.append(_slot_fold(rows, w16))
    grow, w64, _ = _grid_geometry(x, spec)
    g_rows = grid3d[grow]                                   # (M, 64*Fg)
    feats.append(_slot_fold(g_rows, w64))
    return jnp.concatenate(feats, axis=1)                   # (M, 3Fp+Fg)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def triplane_encode_vjp(params, x, spec: TriplaneSpec, need_dx: bool = False,
                        table_dtype=jnp.float32):
    return _encode_impl(params, x, spec, table_dtype)


def _tp_fwd(params, x, spec, need_dx, table_dtype):
    return _encode_impl(params, x, spec, table_dtype), (params, x)


def _tp_bwd(spec, need_dx, table_dtype, res, g):
    params, x = res
    M = x.shape[0]
    Fp, Fg = spec.plane_feats, spec.grid3d_feats
    # Under bf16 tables the gradient scatter-adds also accumulate in
    # bf16 (cast back to f32 after — one streaming pass over the table
    # vs M scattered rows). This is tcnn's production behavior (fp16
    # hash-table gradients, reference models/ngp_mt.py:70-82) and
    # halves the scatter's per-row write traffic; the ~11 ns/index
    # fixed cost remains (probe_scatter.py), so the win is ~10-15%.
    acc_dtype = table_dtype
    d_planes = []
    dx = jnp.zeros((M, 3), jnp.float32)
    for pi, (a, b) in enumerate(_PLANES):
        row, w16, (dwu16, dwv16) = _plane_geometry(x[:, (a, b)], spec)
        g_p = g[:, pi * Fp:(pi + 1) * Fp]                   # (M, Fp)
        # broadcast outer product in FEATURE-MAJOR order (one fused
        # pass, row layout matching _slot_fold) — not repeat*tile,
        # which materialized two extra (M, 128) intermediates
        upd = (g_p[:, :, None] * w16[:, None, :]).reshape(M, Fp * 16)
        d_pl = jnp.zeros((spec.nb2 ** 2, 128), acc_dtype)
        d_planes.append(
            d_pl.at[row].add(upd.astype(acc_dtype)).astype(jnp.float32))
        # position grads (extrinsic optimization) via the dw terms
        if need_dx:
            rows = params["planes"][pi][row].reshape(M, Fp, 16)
            gd = jnp.einsum("mfs,mf->ms", rows, g_p)
            du = jnp.sum(gd * dwu16, axis=1) * (spec.plane_res - 1)
            dv = jnp.sum(gd * dwv16, axis=1) * (spec.plane_res - 1)
            dx = dx.at[:, a].add(du)
            dx = dx.at[:, b].add(dv)
    grow, w64, (dwx, dwy, dwz) = _grid_geometry(x, spec)
    g_g = g[:, 3 * Fp:]
    updg = (g_g[:, :, None] * w64[:, None, :]).reshape(M, Fg * 64)
    d_grid = (jnp.zeros((spec.nb3 ** 3, 64 * Fg), acc_dtype)
              .at[grow].add(updg.astype(acc_dtype)).astype(jnp.float32))
    if need_dx:
        rows = params["grid3d"][grow].reshape(M, Fg, 64)
        gd = jnp.einsum("mfs,mf->ms", rows, g_g)
        s = spec.grid3d_res - 1
        dx = dx.at[:, 0].add(jnp.sum(gd * dwx, axis=1) * s)
        dx = dx.at[:, 1].add(jnp.sum(gd * dwy, axis=1) * s)
        dx = dx.at[:, 2].add(jnp.sum(gd * dwz, axis=1) * s)
    d_params = {"planes": jnp.stack(d_planes), "grid3d": d_grid}
    return d_params, dx


triplane_encode_vjp.defvjp(_tp_fwd, _tp_bwd)


def triplane_encode(params, x, spec: TriplaneSpec, compute_dtype=jnp.float32,
                    need_dx: bool = False):
    """Encode (M, 3) positions in [0,1]^3 -> (M, 3*Fp+Fg) features.

    Under a bf16 compute dtype the table rows are also fetched in bf16
    (see _encode_impl); fold accumulation and gradients stay f32."""
    table_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                   else jnp.float32)
    return triplane_encode_vjp(
        params, x, spec, need_dx, table_dtype).astype(compute_dtype)


def triplane_encode_reference_np(params, x, spec: TriplaneSpec):
    """NumPy oracle (scalar-explicit bilinear/trilinear)."""
    x = np.asarray(x, np.float32)
    M = x.shape[0]
    Fp, Fg = spec.plane_feats, spec.grid3d_feats
    out = np.zeros((M, spec.out_dim), np.float32)
    planes = np.asarray(params["planes"])
    for pi, (a, b) in enumerate(_PLANES):
        R = spec.plane_res
        pos = np.clip(x[:, (a, b)] * (R - 1), 0.0, R - 2 + 1e-6)
        p0 = np.floor(pos).astype(np.int64)
        f = pos - p0
        brick = p0 // 3
        row = brick[:, 0] * spec.nb2 + brick[:, 1]
        acc = np.zeros((M, Fp), np.float32)
        for cu in (0, 1):
            for cv in (0, 1):
                lu = p0[:, 0] - 3 * brick[:, 0] + cu
                lv = p0[:, 1] - 3 * brick[:, 1] + cv
                slot = lu * 4 + lv
                w = (np.where(cu, f[:, 0], 1 - f[:, 0])
                     * np.where(cv, f[:, 1], 1 - f[:, 1]))
                vals = planes[pi, row].reshape(M, Fp, 16)[np.arange(M), :, slot]
                acc += w[:, None] * vals
        out[:, pi * Fp:(pi + 1) * Fp] = acc
    grid = np.asarray(params["grid3d"])
    R = spec.grid3d_res
    pos = np.clip(x * (R - 1), 0.0, R - 2 + 1e-6)
    p0 = np.floor(pos).astype(np.int64)
    f = pos - p0
    brick = p0 // 3
    row = (brick[:, 0] * spec.nb3 + brick[:, 1]) * spec.nb3 + brick[:, 2]
    acc = np.zeros((M, Fg), np.float32)
    for c in range(8):
        cx, cy, cz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        l = p0 - 3 * brick + [cx, cy, cz]
        slot = (l[:, 0] * 16 + l[:, 1] * 4 + l[:, 2])
        w = (np.where(cx, f[:, 0], 1 - f[:, 0])
             * np.where(cy, f[:, 1], 1 - f[:, 1])
             * np.where(cz, f[:, 2], 1 - f[:, 2]))
        vals = grid[row].reshape(M, Fg, 64)[np.arange(M), :, slot]
        acc += w[:, None] * vals
    out[:, 3 * Fp:] = acc
    return out
