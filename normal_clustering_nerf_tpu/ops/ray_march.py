"""Occupancy-bitfield ray marching as closed-form step grids + gathers.

TPU-native replacement for the reference's per-thread sequential DDA
CUDA kernel (reference: models/csrc/raymarching.cu:166-332). The key
observation: the CUDA walk's t-sequence is *data independent* —
``t_{k+1} = t_k + clamp(t_k*f, lo, hi)`` (raymarching.cu:11-13) is used
both for sampling steps and for the empty-space do-while stepping
(raymarching.cu:230-233), so occupancy only decides whether a step
*records* a sample, never where the ray lands. The whole march is
therefore:

  1. closed-form evaluation of the step sequence t_k (piecewise
     linear / geometric / linear in k) for all rays at once,
  2. one vectorized occupancy-bitfield gather over the (n_rays, S)
     step grid,
  3. deterministic compaction of occupied steps into a flat sample
     budget via cumsum (replacing the reference's nondeterministic
     atomicAdd compaction, raymarching.cu:237-241).

No sequential loop, fully static shapes, and bit-for-bit deterministic.

Exactness: for single-cascade scenes (scale <= 0.5, all headline
datasets after pose rescaling) this produces *identical* samples to the
CUDA kernel. For multi-cascade scenes the CUDA empty-skip commits to a
voxel-exit computed at the entering mip and can overshoot occupied
cells of another cascade mid-skip; probing every step (as we do) cannot
— a documented, strictly-more-accurate deviation.

Note: the reference's *test* kernel passes `cascades` where `scale` is
expected in calc_dt (raymarching.cu:370,399) — an upstream bug we do
not reproduce.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .packbits import unpack_bit

SQRT3 = math.sqrt(3.0)


def calc_dt(t, exp_step_factor, max_samples, grid_size, scale):
    """reference: models/csrc/raymarching.cu:11-13. CUDA clamp(v, lo, hi)
    is max(lo, min(v, hi)) (lo wins if lo > hi), reproduced exactly."""
    lo = SQRT3 / max_samples
    hi = SQRT3 * 2.0 * scale / grid_size
    return jnp.maximum(lo, jnp.minimum(t * exp_step_factor, hi))


def _mip_from_pos(xyz, cascades):
    # reference: models/csrc/raymarching.cu:19-23 (frexp exponent + 1)
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    exponent = jnp.frexp(mx)[1]
    return jnp.clip(exponent + 1, 0, cascades - 1)


def _mip_from_dt(dt, grid_size, cascades):
    # reference: models/csrc/raymarching.cu:29-32
    exponent = jnp.frexp(dt * grid_size)[1]
    return jnp.clip(exponent, 0, cascades - 1)


def occupancy_lookup(xyz, dt, bitfield, *, cascades, scale, grid_size):
    """Occupancy bit for sample positions.

    Cell addressing matches raymarching.cu:208-220 except the in-mip
    cell index is linear x-major instead of Morton: on TPU the bitfield
    is a flat gather either way, so we use the cheaper index. The
    bitfield must be packed in the same order (models/occupancy.py).

    Args:
      xyz: (..., 3) positions, dt: (...) step sizes.
    Returns: (...) bool occupancy.
    """
    G = grid_size
    if cascades == 1:
        # single-cascade fast path: mip is always 0, bound = min(1/2, scale)
        mip_bound = min(0.5, scale)
        cell = jnp.clip(
            0.5 * (xyz / mip_bound + 1.0) * G, 0.0, G - 1.0
        ).astype(jnp.int32)
        idx = (cell[..., 2] * G + cell[..., 1]) * G + cell[..., 0]
        return unpack_bit(bitfield, idx)
    mip = jnp.maximum(
        _mip_from_pos(xyz, cascades), _mip_from_dt(dt, G, cascades)
    )
    # mip_bound = min(2^(mip-1), scale)  (raymarching.cu:211)
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), scale)
    inv_b = (1.0 / mip_bound)[..., None]
    cell = jnp.clip(0.5 * (xyz * inv_b + 1.0) * G, 0.0, G - 1.0).astype(jnp.int32)
    idx = ((mip * G + cell[..., 2]) * G + cell[..., 1]) * G + cell[..., 0]
    return unpack_bit(bitfield, idx)


def t_step_grid(t0, n_steps, *, exp_step_factor, max_samples, grid_size, scale):
    """Closed-form t_k for the CUDA stepping recurrence, k in [0, n_steps).

    t_{k+1} = t_k + calc_dt(t_k). Piecewise in k: while t <= lo/f the
    step is the constant lo; in (lo/f, hi/f] it is geometric with ratio
    (1+f); beyond it is the constant hi. f == 0 degenerates to a
    uniform grid with step lo.

    Args:
      t0: (N,) start distances (>= 0 for hitting rays).
    Returns:
      (N, n_steps) t grid.
    """
    lo = SQRT3 / max_samples
    hi = SQRT3 * 2.0 * scale / grid_size
    f = exp_step_factor
    k = jnp.arange(n_steps, dtype=jnp.float32)[None, :]
    t0 = t0[:, None]

    if f == 0.0 or lo >= hi:
        # calc_dt == lo everywhere (CUDA clamp lets lo win when lo > hi)
        return t0 + k * lo

    A = lo / f   # below: dt = lo
    B = hi / f   # above: dt = hi
    t0s = jnp.maximum(t0, 0.0)

    # phase A: k_A steps of lo  (t_k = t0 + k*lo while t_k <= A)
    kA = jnp.where(t0s <= A, jnp.floor((A - t0s) / lo) + 1.0, 0.0)
    tA = t0s + kA * lo
    # phase B: geometric while t <= B
    ratio = 1.0 + f
    log_ratio = math.log(ratio)
    jB = jnp.where(
        tA <= B,
        jnp.floor(jnp.log(B / jnp.maximum(tA, 1e-30)) / log_ratio) + 1.0,
        0.0,
    )
    tB = tA * jnp.power(ratio, jB)

    j = k - kA
    t_geo = tA * jnp.power(ratio, jnp.maximum(j, 0.0))
    t_lin_hi = tB + (j - jB) * hi
    t = jnp.where(k <= kA, t0s + k * lo, jnp.where(j <= jB, t_geo, t_lin_hi))
    return t


class MarchResult(NamedTuple):
    """Compact (budget-sized) sample buffers, ray-major ordered."""
    ray_id: jnp.ndarray     # (B,) int32 owning ray of each sample
    t: jnp.ndarray          # (B,) sample distance
    dt: jnp.ndarray         # (B,) integration step
    valid: jnp.ndarray      # (B,) bool
    ray_start: jnp.ndarray  # (N,) int32 first slot of each ray's segment
    ray_count: jnp.ndarray  # (N,) int32 samples of each ray in budget
    rm_samples: jnp.ndarray  # () int32 total marched samples (pre-budget)


def compact_samples(include, tg, dtg, budget: int) -> MarchResult:
    """Deterministically compact included (ray, step) samples into a flat
    ray-major budget via cumsum (the XLA-native replacement for the
    reference's atomicAdd compaction, raymarching.cu:237-241).

    Args:
      include: (N, S) bool; tg/dtg: (N, S) step grids; budget: static B.
    """
    N, S = include.shape
    B = budget
    rm_samples = jnp.sum(include)

    flat_inc = include.reshape(-1)
    pos = jnp.cumsum(flat_inc.astype(jnp.int32)) - 1      # target slot
    within = flat_inc & (pos < B)
    # slot b <- flat index of the b-th included sample
    src = jnp.full((B + 1,), N * S, dtype=jnp.int32)
    src = src.at[jnp.where(within, pos, B)].set(
        jnp.arange(N * S, dtype=jnp.int32), mode="drop"
    )[:B]
    n_compact = jnp.minimum(rm_samples, B)
    valid = jnp.arange(B, dtype=jnp.int32) < n_compact

    src_safe = jnp.minimum(src, N * S - 1)
    ray_id = (src_safe // S).astype(jnp.int32)
    t_c = jnp.where(valid, tg.reshape(-1)[src_safe], 0.0)
    dt_c = jnp.where(valid, dtg.reshape(-1)[src_safe], 0.0)
    ray_id = jnp.where(valid, ray_id, N - 1)

    ray_count = jnp.sum(include & within.reshape(N, S), axis=-1).astype(jnp.int32)
    ray_start = jnp.cumsum(ray_count) - ray_count

    return MarchResult(
        ray_id=ray_id, t=t_c, dt=dt_c, valid=valid,
        ray_start=ray_start, ray_count=ray_count, rm_samples=rm_samples,
    )


def march_rays_train(
    rays_o,
    rays_d,
    hits_t,
    bitfield,
    noise,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    sample_budget: int,
    march_steps: int = 0,
    per_ray_cap: int = 0,
    tail_k: int = 0,
) -> MarchResult:
    """March all rays and compact occupied samples into a flat budget.

    Args:
      rays_o, rays_d: (N, 3); directions unit-norm.
      hits_t: (N, 2) near/far from `ray_aabb_intersect` (-1 on miss).
      bitfield: (cascades*G^3/8,) uint8.
      noise: (N,) uniform [0,1) first-step jitter
        (reference: raymarching.cu:195-198).
      sample_budget: B, static cap on total samples across the batch
        (the network-evaluation batch size). Overflow samples drop
        far-to-near per flattened order; rm_samples reports the
        pre-drop count.
      march_steps: length S of the step grid; 0 means max_samples
        (sufficient for any scene whose ray span is <= sqrt(3), i.e.
        scale <= 0.5; larger scenes march coarser steps so S =
        max_samples still covers — see module docstring).
      per_ray_cap: additional per-ray sample cap (0 = none). When the
        budget would overflow, a fair per-ray cap (budget/n_rays) keeps
        every ray represented instead of the ray-major prefix starving
        late rays — important early in training when the occupancy grid
        is dense and rays march hundreds of samples.
    """
    N = rays_o.shape[0]
    S = march_steps or max_samples
    B = sample_budget
    t1, t2 = hits_t[:, 0], hits_t[:, 1]

    dt0 = calc_dt(t1, exp_step_factor, max_samples, grid_size, scale)
    t0 = t1 + dt0 * noise

    tg = t_step_grid(
        t0, S, exp_step_factor=exp_step_factor, max_samples=max_samples,
        grid_size=grid_size, scale=scale,
    )  # (N, S)
    dtg = calc_dt(tg, exp_step_factor, max_samples, grid_size, scale)
    xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(
        xyz, dtg, bitfield, cascades=cascades, scale=scale, grid_size=grid_size
    )
    in_range = (t1 >= 0)[:, None] & (tg < t2[:, None])
    hit = occ & in_range
    cap = min(max_samples, per_ray_cap) if per_ray_cap else max_samples
    # same budgeted selection as the dense layout (first-K cap or
    # even-rank stratified tail) so the flat oracle stays in lockstep
    # with the production path at any tail_k
    include, span = stratified_budget(hit, cap, tail_k)
    dtg = dtg * span.astype(dtg.dtype)  # span == 1 outside scaled tails
    return compact_samples(include, tg, dtg, B)


class DenseMarchResult(NamedTuple):
    """Per-ray dense (N, K) sample buffers (the fast training layout)."""
    t: jnp.ndarray          # (N, K) sample distances
    dt: jnp.ndarray         # (N, K) integration steps
    valid: jnp.ndarray      # (N, K) bool
    ray_count: jnp.ndarray  # (N,) int32 samples per ray
    rm_samples: jnp.ndarray  # () int32 total marched samples (pre-cap)
    # () int32: rays whose sample set was TRUNCATED by a bounded
    # enumeration budget (sv_intervals / coarse_k_blocks) before the
    # per-ray K cap was reached — i.e. rays that would have received
    # more samples under the unbounded reference enumeration
    # (raymarching.cu:166-332). Zero for exact layouts. Exposed so the
    # silent-cap bias that poisons training is visible in step metrics.
    trunc_rays: jnp.ndarray = jnp.zeros((), jnp.int32)


def select_first_k(include, k: int):
    """Per-row indices of the first `k` True entries of `include` (N, S).

    top_k on the score ``include * (S - col)`` ranks included columns by
    ascending column index; this is the scatter-free row compaction
    primitive (TPU scatters serialize per element — measured ~25x slower
    than top_k at (8192, 1024)->32).

    Returns (idx (N, k) int32 ascending per row, valid (N, k) bool).
    """
    S = include.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, include.shape, len(include.shape) - 1)
    score = jnp.where(include, S - col, 0)
    v, idx = jax.lax.top_k(score, k)
    return idx.astype(jnp.int32), v > 0


def stratified_budget(include, K: int, tail_k: int):
    """Per-row sample selection under a K budget with a coverage tail.

    The first ``K - tail_k`` occupied steps are taken verbatim; the
    remaining ``tail_k`` slots are placed at evenly spaced occupied
    ranks over the REST of the ray — rank ``K1 + floor(j*E/K2)`` for
    ``j = 1..K2`` where ``E`` is the occupied count beyond ``K1`` — so
    ALL K budget slots are used for any E >= K2 (no stride-quantisation
    utilisation cliff at E slightly above K2) and each tail sample's
    represented span sums exactly to E (no final-group
    over-integration). Exact (== first-K) whenever a ray's occupied
    count fits the budget.

    Why: a pure first-K cap starves distal geometry of gradient whenever
    proximal occupancy exists — e.g. view-dependent fog billboards form
    in front of each training camera, consume the whole budget, and
    self-reinforce (measured: train-view 28 dB / held-out 17 dB with
    near-zero predicted depth). The unbounded reference march
    (raymarching.cu:166-332) always reaches distal samples; the tail
    restores that coverage guarantee at fixed cost.

    Returns (sel (N,S) bool, span (N,S) int32 >= 1): multiply selected
    samples' dt by ``span`` so transmittance still integrates the
    represented occupied extent.
    """
    cnt = jnp.cumsum(include.astype(jnp.int32), axis=-1)
    ones = jnp.ones_like(cnt)
    if tail_k <= 0:
        return include & (cnt <= K), ones
    K1 = max(K - tail_k, 0)
    K2 = tail_k
    M = cnt[:, -1:]
    E = jnp.maximum(M - K1, 0)
    x = cnt - K1                    # tail rank of each sample (>= 1 in tail)
    Es = jnp.maximum(E, 1)
    # smallest j whose even-rank target floor(j*E/K2) reaches x
    jstar = -((-x * K2) // Es)      # ceil(x*K2/E)
    sel_even = (jstar * Es) // K2 == x
    span_even = x - ((jstar - 1) * Es) // K2
    exact = E <= K2                 # every tail rank fits: take all
    in_tail = include & (x >= 1)
    sel = (include & (cnt <= K1)) | (in_tail & (exact | sel_even))
    span = jnp.where(in_tail & ~exact & sel_even, span_even, ones)
    return sel, span


def rank_targets(m_tot, K: int, tail_k: int):
    """Closed-form occupied-rank targets for the K budget slots.

    The selection rule of `stratified_budget` expressed directly as the
    global occupied rank each output slot should hold (1-based), given
    each ray's total occupied count ``m_tot`` (N,): slots 0..K1-1 take
    ranks 1..K1 verbatim; tail slot j (1-based) takes rank
    ``K1 + floor(j*E/K2)`` with represented span
    ``floor(j*E/K2) - floor((j-1)*E/K2)`` when ``E = m_tot - K1`` exceeds
    K2, else rank ``K1 + j`` with span 1. A slot is valid iff its target
    rank <= m_tot.

    This form lets the march pick samples WITHOUT materializing and
    sorting the full candidate set: rank -> candidate is resolved by a
    cumsum + searchsorted over the interval structure (see _sv_scan).
    Returns (targets (N, K) int32, span (N, K) int32 >= 1).
    """
    N = m_tot.shape[0]
    i = jnp.arange(K, dtype=jnp.int32)[None, :]
    ones = jnp.ones((N, K), jnp.int32)
    if tail_k <= 0:
        return jnp.broadcast_to(i + 1, (N, K)), ones
    K1, K2 = max(K - tail_k, 0), tail_k
    E = jnp.maximum(m_tot.astype(jnp.int32) - K1, 0)[:, None]   # (N, 1)
    j = i - K1 + 1                                # 1-based tail index
    exact = E <= K2
    tgt_even = (j * E) // K2
    tgt_prev = ((j - 1) * E) // K2
    tail_tgt = K1 + jnp.where(exact, j, tgt_even)
    tail_span = jnp.where(exact, 1, tgt_even - tgt_prev)
    targets = jnp.where(i < K1, i + 1, tail_tgt)
    span = jnp.maximum(jnp.where(i < K1, 1, tail_span), 1)
    return targets, span


def coarse_lookup(xyz, coarse_occ, *, scale, grid_size):
    """Dilated supervoxel occupancy probe (cascade 0 only).

    `coarse_occ` is the box-dilated (G/8)^3 mask maintained by
    models/occupancy.py:coarse_occupancy in the same [z, y, x]-linear
    layout as the fine bitfield. Because the mask is dilated by one
    supervoxel per axis, a positive test at any point within one
    supervoxel (Chebyshev) of an occupied fine cell is guaranteed.
    """
    Gc = grid_size // 8
    mip_bound = min(0.5, scale)
    cell = jnp.clip(
        0.5 * (xyz / mip_bound + 1.0) * Gc, 0.0, Gc - 1.0
    ).astype(jnp.int32)
    idx = (cell[..., 2] * Gc + cell[..., 1]) * Gc + cell[..., 0]
    return coarse_occ[idx] > 0


# Steps per coarse block. Safety bound: the probe sits at the block's
# first step; the farthest in-block step is (COARSE_BLOCK-1)*dt_max =
# 3*sqrt(3)*2*scale/G ~= 10.4*scale/G away per axis, under one
# supervoxel (16*scale/G for cascades==1), so the 1-dilated coarse mask
# at the probe point covers every step in the block.
COARSE_BLOCK = 4


def march_rays_train_dense(
    rays_o,
    rays_d,
    hits_t,
    bitfield,
    noise,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    samples_per_ray: int,
    march_steps: int = 0,
    coarse_occ=None,
    coarse_k_blocks: int = 0,
    tail_k: int = 0,
) -> DenseMarchResult:
    """March all rays into a dense (N, K) per-ray sample layout.

    Functionally identical to `march_rays_train` with
    `per_ray_cap = K = samples_per_ray` (the default training config:
    models/rendering.py passes per_ray_cap = budget // N), but built
    entirely from row-parallel vector ops — occupancy probe, cumsum,
    top_k first-K selection, take_along_axis — with no global scatter
    and no segment bookkeeping. On TPU this layout is ~10x faster than
    the flat compaction (scatters serialize; top_k and row gathers
    vectorize) and the downstream compositing becomes plain per-row
    cumulative ops (ops/composite.py:composite_rays).

    Reference semantics preserved: step sequence, occupancy skip, and
    per-ray first-K cap match models/csrc/raymarching.cu:166-332 with a
    fair per-ray budget (see march_rays_train docstring).

    When `coarse_occ` is given (and cascades == 1), a two-level march
    prunes the fine occupancy probe: the dilated supervoxel mask is
    probed once per COARSE_BLOCK-step block (S/4 probes instead of S),
    and fine probes run only on the first `coarse_k_blocks` candidate
    blocks per ray. Pruned blocks are provably empty (see
    coarse_lookup), so results are exact unless a ray's first K
    occupied samples span more than coarse_k_blocks candidate blocks
    (then its sample set truncates early — same flavor of bound as the
    per-ray cap itself).
    """
    N = rays_o.shape[0]
    S = march_steps or max_samples
    K = min(samples_per_ray, S)  # top_k requires k <= S
    t1, t2 = hits_t[:, 0], hits_t[:, 1]

    dt0 = calc_dt(t1, exp_step_factor, max_samples, grid_size, scale)
    t0 = t1 + dt0 * noise

    tg = t_step_grid(
        t0, S, exp_step_factor=exp_step_factor, max_samples=max_samples,
        grid_size=grid_size, scale=scale,
    )  # (N, S)
    in_range_fn = lambda t: (t1 >= 0)[:, None] & (t < t2[:, None])

    n_cand_extra = None
    if coarse_occ is not None and cascades == 1 and S % COARSE_BLOCK == 0:
        BS = COARSE_BLOCK
        KB = min(coarse_k_blocks or max(2 * K // BS, 8), S // BS)
        # coarse probe at each block's first step
        tgc = tg[:, ::BS]                                  # (N, S/BS)
        xyz_c = rays_o[:, None, :] + tgc[..., None] * rays_d[:, None, :]
        cand = coarse_lookup(xyz_c, coarse_occ, scale=scale,
                             grid_size=grid_size) & in_range_fn(tgc)
        bidx, bval = select_first_k(cand, KB)              # (N, KB)
        # candidate blocks beyond the KB budget -> potential truncation
        n_cand_extra = jnp.sum(cand, axis=-1) - jnp.sum(bval, axis=-1)
        cols = (bidx[:, :, None] * BS
                + jnp.arange(BS, dtype=jnp.int32)[None, None, :]
                ).reshape(N, KB * BS)
        colv = jnp.repeat(bval, BS, axis=1)
        tg = jnp.take_along_axis(tg, cols, axis=1)         # (N, KB*BS)
        gate = colv
    else:
        gate = True

    dtg = calc_dt(tg, exp_step_factor, max_samples, grid_size, scale)
    xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(
        xyz, dtg, bitfield, cascades=cascades, scale=scale, grid_size=grid_size
    )
    include = occ & gate & in_range_fn(tg)
    # budgeted selection: first-K cap, optionally with an even-rank
    # coverage tail (tail_k > 0) so distal occupied samples keep
    # receiving gradient when proximal occupancy would exhaust K
    sel, span = stratified_budget(include, K, tail_k)
    rm_samples = jnp.sum(sel)

    idx, valid = select_first_k(sel, min(K, include.shape[1]))
    t_k = jnp.where(valid, jnp.take_along_axis(tg, idx, axis=1), 0.0)
    dt_k = jnp.where(valid, jnp.take_along_axis(dtg, idx, axis=1), 0.0)
    if tail_k > 0:
        sp_k = jnp.take_along_axis(span, idx, axis=1)
        dt_k = dt_k * sp_k.astype(dt_k.dtype)
    ray_count = jnp.sum(valid, axis=-1).astype(jnp.int32)
    if n_cand_extra is None:
        trunc = jnp.zeros((), jnp.int32)   # exact enumeration, no cap
    elif tail_k > 0:
        # under a stratified tail ANY skipped candidate block biases
        # the sample distribution proximally (selection depends on the
        # whole enumerated extent), so count every ray with candidate
        # blocks beyond the coarse_k_blocks budget
        trunc = jnp.sum(n_cand_extra > 0).astype(jnp.int32)
    else:
        # first-K semantics: only under-filled rays with candidate
        # blocks left beyond the budget lost samples the unbounded
        # reference march would have given them
        trunc = jnp.sum((ray_count < K) & (n_cand_extra > 0)).astype(jnp.int32)
    return DenseMarchResult(
        t=t_k, dt=dt_k, valid=valid, ray_count=ray_count,
        rm_samples=rm_samples, trunc_rays=trunc,
    )


def march_rays_train_dense_sv(
    rays_o,
    rays_d,
    hits_t,
    sv_mask,
    sv_payload,
    noise,
    *,
    scale: float,
    grid_size: int,
    max_samples: int,
    samples_per_ray: int,
    march_steps: int = 0,
    n_intervals: int = 8,
    tail_k: int = 0,
) -> DenseMarchResult:
    """Supervoxel-run march — the uniform-step single-cascade fast path.

    Replaces per-step occupancy probes (gather cost ~8 ns per INDEX on
    TPU, the dominant march cost) with per-supervoxel-run work:

      1. closed-form supervoxel boundary crossings (3 arithmetic
         progressions, one per axis) sorted into ray intervals — each
         interval lies in exactly one (G/8)^3 supervoxel;
      2. ONE gather per interval midpoint into the undilated
         supervoxel mask (~51 indices/ray instead of S=1024);
      3. for the first `n_intervals` occupied intervals, ONE row
         gather fetches the supervoxel's full 512-bit fine occupancy
         payload (models/occupancy.py supervoxel_tables); per-step bit
         extraction is then pure VPU math (one-hot word select + an
         integer vector shift — no gathers).

    Exactness: produces the identical sample set to
    `march_rays_train_dense` (parity-tested) unless a ray's first K
    occupied samples span more than `n_intervals` occupied supervoxel
    crossings — then its tail truncates (same flavor of bound as the
    per-ray cap). Preconditions: cascades == 1, exp_step_factor == 0
    (uniform dt), grid_size % 8 == 0.
    """
    lo = SQRT3 / max_samples
    S = march_steps or max_samples
    K = min(samples_per_ray, S)
    if n_intervals <= 0:
        # auto-full horizon: supervoxel visits are bounded by axis-plane
        # crossings — at most Gc - 1 boundary planes per axis plus the
        # starting cell, i.e. 3*(Gc-1) + 1 <= 3*Gc cells for ANY ray
        # (NOT the sqrt(3)*Gc diagonal *length*: a near-diagonal ray
        # crosses a new cell at every axis plane) — so truncation is
        # impossible by construction (the silent-horizon cap starved
        # distal geometry of gradient and forced billboard
        # memorization — round-3 diagnosis, trunc_ray_frac 0.78 under
        # a dense grid)
        n_intervals = 3 * (grid_size // 8)
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    hit = t1 >= 0
    t0 = t1 + lo * noise
    t_end = jnp.where(hit, jnp.minimum(t2, t0 + S * lo), -jnp.inf)
    t_k, dt_k, valid, ray_count, rm_samples, scan_end, iv_extra = _sv_scan(
        rays_o, rays_d, t0, t_end, hit, sv_mask, sv_payload,
        scale=scale, grid_size=grid_size, K=K, S=S, lo=lo, RI=n_intervals,
        tail_k=tail_k)
    if tail_k > 0:
        # stratified selection depends on the whole enumerated extent:
        # ANY skipped occupied run biases the sample set even when K
        # samples were collected
        trunc = jnp.sum(hit & (iv_extra > 0)).astype(jnp.int32)
    else:
        # first-K semantics: only under-filled rays with occupied runs
        # left beyond the sv_intervals budget lost reference samples
        trunc = jnp.sum(hit & (ray_count < K) & (iv_extra > 0)).astype(jnp.int32)
    return DenseMarchResult(
        t=t_k, dt=dt_k, valid=valid, ray_count=ray_count,
        rm_samples=rm_samples, trunc_rays=trunc,
    )


def _sv_scan(rays_o, rays_d, t0, t_end, hit, sv_mask, sv_payload, *,
             scale, grid_size, K, S, lo, RI, tail_k: int = 0):
    """Core supervoxel-run scan (see march_rays_train_dense_sv).

    Returns (t_k (N,K), dt_k, valid, ray_count, rm_samples, scan_end,
    iv_extra) where scan_end is the per-ray horizon up to which the scan
    provably enumerated every occupied sample (t_end, or the end of the
    RI-th occupied interval when the interval budget was exhausted) and
    iv_extra (N,) counts occupied intervals beyond the RI budget (> 0
    means the scan skipped occupied supervoxel runs).
    """
    N = rays_o.shape[0]
    G = grid_size
    Gc = G // 8
    mb = min(0.5, scale)
    sv = 2.0 * mb / Gc
    SI = int(sv * SQRT3 / lo) + 3
    inf = jnp.float32(jnp.inf)

    # ---- phase A: supervoxel boundary crossings -> occupied intervals
    jj = jnp.arange(Gc + 1, dtype=jnp.float32)                # (Gc+1,)
    denom = jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)   # (N, 3)
    tb = ((jj[None, None, :] * sv - mb) - rays_o[:, :, None]) / denom[:, :, None]
    tb = tb.reshape(N, 3 * (Gc + 1))
    tb = jnp.where((tb > t0[:, None]) & (tb < t_end[:, None]), tb, inf)
    t0b = jnp.where(hit, t0, inf)[:, None]
    teb = jnp.where(hit, t_end, inf)[:, None]
    bounds = jnp.sort(jnp.concatenate([t0b, tb, teb], axis=1), axis=1)
    b0, b1 = bounds[:, :-1], bounds[:, 1:]                    # (N, NB)
    tm = 0.5 * (b0 + b1)
    iv_valid = jnp.isfinite(b1) & (b1 > b0 + 1e-9)

    svc = []
    for a in range(3):
        pos_a = rays_o[:, a:a + 1] + jnp.where(iv_valid, tm, 0.0) * rays_d[:, a:a + 1]
        svc.append(jnp.clip(jnp.floor((pos_a + mb) / sv), 0, Gc - 1
                            ).astype(jnp.int32))
    sv_id = (svc[2] * Gc + svc[1]) * Gc + svc[0]              # (N, NB)
    # Supervoxel occupancy probe. The mask is tiny (Gc^3 cells), so for
    # production sizes it fits a few hundred 32-bit words: pack it once
    # per call (one pass over Gc^3 elements) and resolve all N*NB
    # probes with a one-hot word select + vector bit shift — a pure VPU
    # fusion. The straight u8 gather costs ~8 ns/index (3.5 ms/step at
    # 8192 rays x 52 intervals, r4 trace fusion.741); the packed select
    # is ~10x cheaper. Fall back to the gather for huge grids where the
    # (N, NB, W) one-hot would dominate.
    Gc3 = Gc * Gc * Gc
    W = Gc3 // 32
    if Gc3 % 32 == 0 and W <= 1024:
        words = jnp.sum(
            (sv_mask.reshape(W, 32) > 0).astype(jnp.int32)
            << jnp.arange(32, dtype=jnp.int32)[None, :], axis=1)
        wsel = jnp.sum(
            jnp.where((sv_id >> 5)[..., None]
                      == jnp.arange(W, dtype=jnp.int32),
                      words[None, None, :], 0), axis=-1)
        occ_probe = ((wsel >> (sv_id & 31)) & 1) > 0
    else:
        occ_probe = sv_mask[sv_id] > 0
    occ_iv = occ_probe & iv_valid
    # a ray enters each supervoxel once; duplicate-sv intervals only
    # arise from degenerate corner crossings and are always adjacent.
    # Invalid (sliver/padding) intervals get a sentinel id so they can
    # never shadow the REAL interval that follows them (their midpoint
    # position is garbage — computed at t=0, i.e. the ray origin, whose
    # supervoxel can coincide with the next interval's and silently
    # dropped whole occupied runs at production scale).
    sv_id_cmp = jnp.where(iv_valid, sv_id, -1)
    occ_iv = occ_iv & ((sv_id_cmp != jnp.roll(sv_id_cmp, 1, axis=1))
                       | (jnp.arange(sv_id.shape[1]) == 0)[None, :])

    iidx, ivalid = select_first_k(occ_iv, min(RI, occ_iv.shape[1]))
    RI = iidx.shape[1]
    # occupied intervals beyond the RI budget (0 = exact enumeration)
    iv_extra = jnp.sum(occ_iv, axis=-1) - jnp.sum(ivalid, axis=-1)
    # Interval-table lookups as one-hot compare-reduces, NOT
    # take_along_axis: a batched (N, RI) gather from a (N, NB) tiled
    # array costs ~20 ns/index on v5e (r4 trace: 6 ms/step for these
    # three), while the (N, RI, NB) compare+multiply reduce fuses into
    # one VPU pass over ~10M elements (NB ~ 52).
    oh_iv = (iidx[:, :, None]
             == jnp.arange(b0.shape[1], dtype=jnp.int32))     # (N, RI, NB)
    # where-select, NOT multiply: b0/b1 pad with +inf and 0*inf = NaN
    ts_r = jnp.sum(jnp.where(oh_iv, b0[:, None, :], 0.0), axis=-1)
    svid_r = jnp.sum(oh_iv.astype(jnp.int32) * sv_id[:, None, :], axis=-1)
    payload = sv_payload[svid_r]                              # (N, RI, 16) int32
    szc = svid_r // (Gc * Gc)
    syc = (svid_r // Gc) % Gc
    sxc = svid_r % Gc

    # scan horizon: everything below it was provably enumerated
    te_last = jnp.sum(jnp.where(oh_iv[:, -1], b1, 0.0), axis=-1)
    scan_end = jnp.where(ivalid[:, -1], te_last, t_end)

    # ---- phase B: enumerate steps per interval, extract payload bits
    k0 = jnp.ceil((ts_r - t0[:, None]) / lo).astype(jnp.int32) - 1
    jloc = jnp.arange(SI, dtype=jnp.int32)
    kk = k0[:, :, None] + jloc[None, None, :]                 # (N, RI, SI)
    tt = t0[:, None, None] + kk.astype(jnp.float32) * lo
    in_rng = ((kk >= 0) & (kk < S) & (tt < t_end[:, None, None])
              & ivalid[:, :, None])

    # global fine cell per axis (same formula as occupancy_lookup),
    # ownership check vs the interval's supervoxel, local coords
    own = in_rng
    loc = []
    for a, svc_sel in ((0, sxc), (1, syc), (2, szc)):
        pos_a = rays_o[:, a, None, None] + tt * rays_d[:, a, None, None]
        # EXACTLY occupancy_lookup's cell formula (op order included):
        # any float-rounding difference at cell boundaries makes the sv
        # march disagree with the bitfield march on boundary samples
        cell_a = jnp.clip(0.5 * (pos_a / mb + 1.0) * G, 0.0, G - 1.0
                          ).astype(jnp.int32)
        own = own & ((cell_a >> 3) == svc_sel[:, :, None])
        loc.append(cell_a - 8 * svc_sel[:, :, None])          # local [0,8)
    lx, ly, lz = loc
    L = (lz * 8 + ly) * 8 + lx                                # [0, 512)
    # 16 words x 32 bits (occupancy.py supervoxel_tables): the one-hot
    # word select is O(words) VPU work per step — 16 wide words halve
    # the r4 32-half-word layout's cost (1.0 ms/step, PROFILE_r05.md)
    w_idx = L >> 5
    b_idx = L & 31

    lanes = jnp.arange(16, dtype=jnp.int32)
    onehot = (w_idx[..., None] == lanes).astype(jnp.int32)    # (N,RI,SI,16)
    word = jnp.sum(payload[:, :, None, :] * onehot, axis=-1)  # (N,RI,SI)
    # integer bit extraction (vector shift on the VPU, no gathers).
    # NB: the previous floor(word * exp2(-b)) % 2 float trick was NOT
    # exact — XLA lowers exp2 to a polynomial approximation that can be
    # 1 ulp off, flipping bits (measured: dropped/phantom samples on
    # ~4% of rays at G=128)
    bit = (word >> b_idx) & 1
    include = (bit > 0) & own

    # ---- phase C: rank-targeted selection over the interval structure.
    # Instead of flattening (N, RI*SI) candidates and sorting (the r4
    # profile's single hottest march op: a (8190, 1608) sort + three
    # 1608-wide take_along_axis chains, ~10 ms/step), resolve each
    # budget slot's target occupied rank directly: cumsum within
    # intervals + a tiny (N, K, RI) searchsorted picks the interval,
    # one (N, K)-row gather fetches its rank row, argmax finds the step.
    cnt = jnp.cumsum(include.astype(jnp.int32), axis=2)       # (N, RI, SI)
    tot = cnt[:, :, -1]                                       # (N, RI)
    cum = jnp.cumsum(tot, axis=1)                             # (N, RI)
    m_tot = cum[:, -1]                                        # (N,)
    targets, span_k = rank_targets(m_tot, K, tail_k)          # (N, K)
    valid = targets <= m_tot[:, None]
    # first interval whose cumulative count reaches the target rank.
    # cum is nondecreasing, so lt rows are [True]*r + [False]*(RI-r);
    # the r-th one-hot is the True->False edge, and the (N, K) interval
    # lookups (prefix count, lattice offset) become one-hot reduces in
    # the same fusion (see the phase-A comment re batched-gather cost).
    lt = cum[:, None, :] < targets[:, :, None]                # (N, K, RI)
    lt_sh = jnp.concatenate(
        [jnp.ones_like(lt[:, :, :1]), lt[:, :, :-1]], axis=2)
    oh_r = (lt_sh & ~lt).astype(jnp.int32)                    # (N, K, RI)
    cum_prev_r = jnp.sum(oh_r * (cum - tot)[:, None, :], axis=2)
    l = targets - cum_prev_r                                  # local rank
    # fetch the chosen interval's within-rank row as a one-hot batched
    # matmul over the RI axis, not a (N*K)-row gather: at test-render
    # widths the gather was the single hottest op (52 ms at 4.2M rows,
    # ~12 ns/row), while the (K, RI) x (RI, SI) batched dot rides the
    # MXU. cnt values are small ints, exact in f32.
    cnt_r = jnp.einsum("nkr,nrs->nks", oh_r.astype(jnp.float32),
                       cnt.astype(jnp.float32),
                       preferred_element_type=jnp.float32)    # (N, K, SI)
    jsel = jnp.argmax(cnt_r >= l[:, :, None].astype(jnp.float32),
                      axis=2).astype(jnp.int32)
    kk_sel = jnp.sum(oh_r * k0[:, None, :], axis=2) + jsel    # lattice step
    t_k = jnp.where(valid, t0[:, None] + kk_sel.astype(jnp.float32) * lo, 0.0)
    dt_k = jnp.where(valid, lo, 0.0)
    if tail_k > 0:
        dt_k = dt_k * span_k.astype(dt_k.dtype)
    ray_count = jnp.sum(valid, axis=-1).astype(jnp.int32)
    rm_samples = jnp.sum(ray_count)
    return t_k, dt_k, valid, ray_count, rm_samples, scan_end, iv_extra


def march_rays_test_round_sv(
    rays_o,
    rays_d,
    cursor,
    t_far,
    alive,
    sv_mask,
    sv_payload,
    *,
    scale: float,
    grid_size: int,
    max_samples: int,
    n_steps: int,
    n_intervals: int = 8,
):
    """One inference marching round via the supervoxel-run scan.

    The sv equivalent of the reference test kernel
    (raymarching.cu:335-404): collect up to `n_steps` occupied samples
    per alive ray starting at its cursor, advancing the cursor PAST the
    last collected sample (or past the provably-enumerated horizon when
    fewer were found). The cursor always lands on the ray's original
    step lattice (cursor + ceil(.)*lo), so the enumerated sample set is
    identical to the fixed-window oracle path.

    Returns (t (N,K), dt (N,K), valid (N,K), new_cursor (N,)).
    """
    lo = SQRT3 / max_samples
    K = n_steps
    hit = alive & (cursor >= 0)
    t0 = cursor
    t_end = jnp.where(hit, t_far, -jnp.inf)
    t_k, dt_k, valid, ray_count, _, scan_end, _ = _sv_scan(
        rays_o, rays_d, t0, t_end, hit, sv_mask, sv_payload,
        scale=scale, grid_size=grid_size, K=K, S=max_samples, lo=lo,
        RI=n_intervals)
    # lattice-aligned cursor: one step past the K-th sample when K were
    # found, else the first lattice point at/after the scan horizon
    t_last = jnp.max(jnp.where(valid, t_k, -jnp.inf), axis=1)
    k_last = jnp.round((t_last - t0) / lo)
    cur_full = t0 + (k_last + 1.0) * lo
    cur_part = t0 + jnp.ceil(jnp.maximum(scan_end - t0, 0.0) / lo) * lo
    new_cursor = jnp.where(ray_count >= K, cur_full, cur_part)
    new_cursor = jnp.where(hit, new_cursor, cursor)
    return t_k, dt_k, valid, new_cursor


def march_rays_test_round_dense(
    rays_o,
    rays_d,
    cursor,
    t_far,
    alive,
    bitfield,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    n_steps: int,
):
    """One inference marching round in the dense (N, n_steps) layout.

    Unlike the flat `march_rays_test_round`, no compaction at all: the
    caller composites the full masked step grid (budget == N * n_steps
    made the flat compaction an identity reshuffle anyway — pure
    scatter cost for nothing).

    Returns (t (N,S), dt (N,S), valid (N,S), new_cursor (N,)).
    """
    tg_ext = t_step_grid(
        cursor, n_steps + 1, exp_step_factor=exp_step_factor,
        max_samples=max_samples, grid_size=grid_size, scale=scale,
    )
    tg = tg_ext[:, :n_steps]
    dtg = calc_dt(tg, exp_step_factor, max_samples, grid_size, scale)
    xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(
        xyz, dtg, bitfield, cascades=cascades, scale=scale, grid_size=grid_size
    )
    valid = occ & alive[:, None] & (cursor >= 0)[:, None] & (tg < t_far[:, None])
    new_cursor = jnp.where(alive, tg_ext[:, -1], cursor)
    return tg, dtg, valid, new_cursor


def march_rays_test_round(
    rays_o,
    rays_d,
    cursor,
    t_far,
    alive,
    bitfield,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    n_steps: int,
    sample_budget: int,
):
    """One inference marching round from per-ray cursors.

    TPU equivalent of the reference's persistent-cursor test kernel
    (raymarching.cu:335-404): march `n_steps` steps of the closed-form
    sequence from each alive ray's cursor, compact occupied steps, and
    advance the cursor to the end of the chunk. The caller loops rounds
    until all rays converge (models/rendering.py test driver).

    Returns (MarchResult, new_cursor (N,)).
    """
    tg_ext = t_step_grid(
        cursor, n_steps + 1, exp_step_factor=exp_step_factor,
        max_samples=max_samples, grid_size=grid_size, scale=scale,
    )
    tg = tg_ext[:, :n_steps]
    dtg = calc_dt(tg, exp_step_factor, max_samples, grid_size, scale)
    xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(
        xyz, dtg, bitfield, cascades=cascades, scale=scale, grid_size=grid_size
    )
    include = occ & alive[:, None] & (cursor >= 0)[:, None] & (tg < t_far[:, None])
    res = compact_samples(include, tg, dtg, sample_budget)
    new_cursor = jnp.where(alive, tg_ext[:, -1], cursor)
    return res, new_cursor
