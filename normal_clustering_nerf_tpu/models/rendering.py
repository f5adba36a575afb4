"""Train/test render drivers.

TPU-native equivalent of the reference render dispatch
(reference: models/rendering.py:10-42) and its train/test ray renderers
(:153-242 and :46-149). The train path is fully jittable and
differentiable end-to-end: AABB intersect -> closed-form occupancy
march -> compacted field evaluation (dense MXU batch) -> segmented
compositing. The test path loops fixed-shape marching/compositing
rounds with per-ray transmittance continuation, replacing the
reference's dynamic alive-ray compaction (rendering.py:78-126) with
masked full-batch rounds.

Known reference quirk not reproduced: models/rendering.py:227 returns
`rays_d` under the key 'rays_o' (so the loss unprojects points as
d*(1+depth) instead of o+d*depth); we return the true origins.
"""
from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops.composite import composite_rays, composite_rays_compact
from ..ops.ray_aabb import ray_aabb_intersect
from ..ops.ray_march import (
    march_rays_test_round, march_rays_test_round_dense, march_rays_train,
    march_rays_train_dense, march_rays_train_dense_sv,
)


def _anneal_hits(hits_t, global_step, strategy, anneal_steps, depth_gt=None):
    """Training ray-interval annealing (reference: rendering.py:168-188)."""
    if anneal_steps <= 0 or strategy == "none":
        return hits_t
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    frac = global_step / anneal_steps
    if strategy == "avoid_near":
        # RegNeRF-style (arXiv 2112.00724); ps = 0.5 (rendering.py:174-178)
        mid = (t1 + t2) / 2.0
        n_i = jnp.clip(frac, 0.5, 1.0)
        t1_new = mid + n_i * (t1 - mid)
        t2_new = t2
    elif strategy == "depth":
        # shrink toward GT depth; ps = 0.05 (rendering.py:179-186)
        n_i = jnp.clip(frac, 0.05, 100.0)
        t1_new = jnp.maximum(depth_gt + n_i * (t1 - depth_gt), t1)
        t2_new = jnp.minimum(depth_gt + n_i * (t2 - depth_gt), t2)
    else:
        raise ValueError(strategy)
    apply = global_step < anneal_steps
    t1 = jnp.where(apply, t1_new, t1)
    t2 = jnp.where(apply, t2_new, t2)
    return jnp.stack([t1, t2], axis=-1)


def _split_rend(model, rend):
    """rend channels -> rgb / norm_nn / sem (reference: rendering.py:214-224)."""
    out = {}
    i = 3
    out["rgb"] = rend[..., :3]
    if model.cfg.pred_norm_nn:
        norm = rend[..., i:i + 3]
        if model.cfg.pred_norm_nn_norm:
            # zero-safe normalize (NaN-free gradient at zero vectors)
            sq = jnp.sum(norm * norm, axis=-1, keepdims=True)
            ok = sq > 1e-12
            norm = jnp.where(ok, norm / jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
        out["norm_nn"] = norm
        i += 3
    if model.cfg.pred_sem:
        out["sem"] = rend[..., i:i + model.cfg.n_sem_cls]
        i += model.cfg.n_sem_cls
    return out


def _bg_color(model, key, random_bg):
    """reference: rendering.py:232-238 — white for synthetic
    (exp_step_factor==0), else random (training) or black.

    Deviation: random_bg takes priority over the white-synthetic rule.
    A FIXED training background creates a degenerate translucent
    attractor for budgeted marches: the model paints luminance as
    (1-opacity)*bg, which pins darker color channels at the sigmoid
    floor and locks opacity at 1-mean(target) (round-4 diagnosis: the
    16 dB grayscale plateau). A per-step random background makes
    transparency unfittable, forcing real surfaces — harmless for
    closed scenes and exactly the reference's own mechanism for its
    real-scene runs."""
    if random_bg:
        return jax.random.uniform(key, (3,))
    if model.cfg.exp_step_factor == 0.0:
        return jnp.ones(3)
    return jnp.zeros(3)


def _field_raws(model, params, xyz, dirs, exposure=None):
    out = model(params, xyz, dirs, exposure=exposure)
    raws = [out["rgbs"]]
    if model.cfg.pred_norm_nn:
        raws.append(out["norms"])
    if model.cfg.pred_sem:
        raws.append(out["sems"])
    return out["sigmas"], jnp.concatenate(raws, axis=-1)


def render_train(
    model,
    params,
    bitfield,
    rays_o,
    rays_d,
    key,
    rcfg: RenderConfig,
    global_step=0,
    depth_gt: Optional[jnp.ndarray] = None,
    exposure: Optional[jnp.ndarray] = None,
    coarse_occ: Optional[jnp.ndarray] = None,
    sv_mask: Optional[jnp.ndarray] = None,
    sv_payload: Optional[jnp.ndarray] = None,
    bootstrap: bool = False,
):
    """Differentiable train-time rendering of a ray batch.

    Mirrors reference models/rendering.py:153-242; returns the same
    result keys plus the compact-segment bookkeeping that replaces
    `rays_a`.

    `bootstrap=True` selects the coarse-step full-probe march for early
    training (see RenderConfig.bootstrap_steps).
    """
    cfg = model.cfg
    N = rays_o.shape[0]
    k_noise, k_bg = jax.random.split(key)

    hits_t = ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale)
    )
    # near-distance clamp (reference: rendering.py:28)
    t1 = hits_t[:, 0]
    t1 = jnp.where((t1 >= 0) & (t1 < cfg.near_dist), cfg.near_dist, t1)
    hits_t = jnp.stack([t1, hits_t[:, 1]], axis=-1)
    hits_t = _anneal_hits(
        hits_t, global_step, rcfg.anneal_strategy, rcfg.anneal_steps, depth_gt
    )

    budget = rcfg.sample_budget or N * 32
    noise = jax.random.uniform(k_noise, (N,)) * rcfg.march_noise
    # -1 = full stratified budget (tail spans the whole allocation)
    tail_k = (budget // N) if rcfg.march_tail_k < 0 else rcfg.march_tail_k
    if rcfg.march_layout == "dense":
        # Fast path: per-ray dense (N, K) sample layout. Same sample set
        # as the flat path with per_ray_cap = K (the training config),
        # but built from row-parallel top_k/gather ops — no global
        # scatter compaction, and compositing/distortion become plain
        # per-row cumulative ops.
        K = budget // N
        use_sv = (not bootstrap and rcfg.march_coarse and sv_mask is not None
                  and cfg.cascades == 1 and cfg.exp_step_factor == 0.0
                  and cfg.grid_size % 8 == 0)
        if bootstrap:
            # coarse-step full-probe march: dt = sqrt(3)/S_boot spans
            # the whole ray with K samples even under a dense grid
            S_boot = min(rcfg.bootstrap_max_samples, cfg.max_samples)
            mr = march_rays_train_dense(
                rays_o, rays_d, hits_t, bitfield, noise,
                cascades=cfg.cascades, scale=cfg.scale,
                exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
                max_samples=S_boot, samples_per_ray=K,
                march_steps=S_boot, tail_k=tail_k,
            )
        elif use_sv:
            mr = march_rays_train_dense_sv(
                rays_o, rays_d, hits_t, sv_mask, sv_payload, noise,
                scale=cfg.scale, grid_size=cfg.grid_size,
                max_samples=cfg.max_samples, samples_per_ray=K,
                march_steps=rcfg.march_block,
                n_intervals=rcfg.sv_intervals,
                tail_k=tail_k,
            )
        else:
            mr = march_rays_train_dense(
                rays_o, rays_d, hits_t, bitfield, noise,
                cascades=cfg.cascades, scale=cfg.scale,
                exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
                max_samples=cfg.max_samples, samples_per_ray=K,
                march_steps=rcfg.march_block,
                coarse_occ=coarse_occ if rcfg.march_coarse else None,
                coarse_k_blocks=rcfg.coarse_k_blocks,
                tail_k=tail_k,
            )
        # t is a constant of the geometry (the reference likewise saves
        # ts and only backprops xyz->rays, custom_functions.py:102-112)
        t_const = jax.lax.stop_gradient(mr.t)
        xyz = (rays_o[:, None, :] + t_const[..., None] * rays_d[:, None, :])
        K = mr.t.shape[1]
        xyz = xyz.reshape(N * K, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (N, K, 3)).reshape(N * K, 3)
        exp_c = (jnp.broadcast_to(exposure[:, None, :], (N, K, exposure.shape[-1]))
                 .reshape(N * K, -1) if exposure is not None else None)
        sigmas, raws = _field_raws(model, params, xyz, dirs, exp_c)
        sigmas = sigmas.reshape(N, K)
        raws = raws.reshape(N, K, -1)

        comp = composite_rays(
            sigmas, raws, mr.dt, mr.t, mr.valid, rcfg.T_threshold,
        )
        results = {
            "opacity": comp["opacity"],
            "depth": comp["depth"],
            "ws": comp["ws"],            # (N, K)
            "deltas": mr.dt,             # (N, K)
            "ts": mr.t,                  # (N, K)
            "ray_count": mr.ray_count,
            "sample_valid": mr.valid,    # (N, K)
            "rm_samples": mr.rm_samples,
            "trunc_rays": mr.trunc_rays,
            "vr_samples": jnp.sum(comp["vr_samples"]),
            "rays_o": rays_o,
            "rays_d": rays_d,
            "depth_std": jnp.ones_like(comp["depth"]),
        }
        results.update(_split_rend(model, comp["rend"]))
        bg = _bg_color(model, k_bg, rcfg.random_bg)
        results["rgb"] = results["rgb"] + bg[None, :] * (1.0 - comp["opacity"][:, None])
        return results

    mr = march_rays_train(
        rays_o, rays_d, hits_t, bitfield, noise,
        cascades=cfg.cascades, scale=cfg.scale,
        exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
        max_samples=cfg.max_samples, sample_budget=budget,
        march_steps=rcfg.march_block,
        per_ray_cap=budget // N,
        tail_k=tail_k,
    )

    # field evaluation on the compact (budget) batch; t is a constant of
    # the geometry (the reference likewise saves ts and only backprops
    # xyz->rays via segment sums, custom_functions.py:102-112)
    t_const = jax.lax.stop_gradient(mr.t)
    xyz = rays_o[mr.ray_id] + t_const[:, None] * rays_d[mr.ray_id]
    dirs = rays_d[mr.ray_id]
    exp_c = exposure[mr.ray_id] if exposure is not None else None
    sigmas, raws = _field_raws(model, params, xyz, dirs, exp_c)

    comp = composite_rays_compact(
        sigmas, raws, mr.dt, mr.t, mr.ray_id, mr.ray_start, mr.valid,
        N, rcfg.T_threshold,
    )

    results = {
        "opacity": comp["opacity"],
        "depth": comp["depth"],
        "ws": comp["ws"],
        "deltas": mr.dt,
        "ts": mr.t,
        "ray_id": mr.ray_id,
        "ray_start": mr.ray_start,
        "ray_count": mr.ray_count,
        "sample_valid": mr.valid,
        "rm_samples": mr.rm_samples,
        "trunc_rays": jnp.zeros((), jnp.int32),  # flat path is exact
        "vr_samples": jnp.sum(comp["vr_samples"]),
        "rays_o": rays_o,
        "rays_d": rays_d,
        "depth_std": jnp.ones_like(comp["depth"]),
    }
    results.update(_split_rend(model, comp["rend"]))
    bg = _bg_color(model, k_bg, rcfg.random_bg)
    results["rgb"] = results["rgb"] + bg[None, :] * (1.0 - comp["opacity"][:, None])
    return results


@lru_cache(maxsize=64)
def _make_test_round_bucket_fn(mcfg, T_threshold, B, K, S_march, with_exposure,
                               use_sv=False, sv_intervals=8):
    """Jitted alive-compacted march+eval+composite block of `rounds`
    rounds.

    The TPU replacement for the reference's dynamic alive-ray compaction
    (reference: models/rendering.py:78-84 + raymarching.cu:335-404):
    instead of a dynamically-shaped alive_indices tensor, each round
    gathers the first `B` alive rays (B a power-of-two bucket chosen by
    the host from the true alive count), marches an `S_march`-step probe
    window from each cursor, selects the first `K` occupied samples per
    ray, and evaluates the field on exactly B*K sample slots — so
    converged rays cost no network evals and per-round work shrinks
    with the alive set. A RUNTIME trip count `r_dyn` of rounds runs
    inside ONE dispatch via lax.fori_loop (the host round-trip —
    dispatch + n_alive fetch — was the dominant cost of the whole test
    renderer on a tunneled TPU: 749 rays/s in round 3). Compiled once
    per (B, K) bucket and cached.
    """
    from .ngp_mt import NGPMT

    if not use_sv and K > S_march:
        raise ValueError(
            f"bucket round K={K} exceeds probe window S_march={S_march}: "
            "select_first_k is a row top_k over the window and requires "
            "K <= S_march")
    model = NGPMT(mcfg)
    mkw = dict(exp_step_factor=mcfg.exp_step_factor,
               max_samples=mcfg.max_samples, grid_size=mcfg.grid_size,
               scale=mcfg.scale)

    def one_round(params, occ_tables, rays_o, rays_d, t2,
                  cursor, alive, opacity, depth, rend, exposure):
        from ..ops.ray_march import (
            calc_dt, march_rays_test_round_sv, occupancy_lookup,
            select_first_k, t_step_grid,
        )
        # ---- alive-ray compaction: first B alive ray ids (row top_k) ----
        idx, sel = select_first_k(alive[None, :], B)
        idx, sel = idx[0], sel[0]                           # (B,)
        ro, rd = rays_o[idx], rays_d[idx]
        cur, far = cursor[idx], t2[idx]
        if use_sv:
            # supervoxel-run round: collect the next K occupied samples
            # directly (no fixed probe window), cursor lattice-aligned
            t_k, dt_k, svalid, new_cur_b = march_rays_test_round_sv(
                ro, rd, cur, far, sel, occ_tables["sv_mask"],
                occ_tables["sv_payload"], scale=mcfg.scale,
                grid_size=mcfg.grid_size, max_samples=mcfg.max_samples,
                n_steps=K, n_intervals=sv_intervals)
        else:
            bitfield = occ_tables["bitfield"]
            # ---- march probe window from each cursor ----
            tg_ext = t_step_grid(cur, S_march + 1, **mkw)
            tg = tg_ext[:, :S_march]
            dtg = calc_dt(tg, mcfg.exp_step_factor, mcfg.max_samples,
                          mcfg.grid_size, mcfg.scale)
            xyz = ro[:, None, :] + tg[..., None] * rd[:, None, :]
            occ = occupancy_lookup(xyz, dtg, bitfield, cascades=mcfg.cascades,
                                   scale=mcfg.scale, grid_size=mcfg.grid_size)
            include = (occ & sel[:, None] & (cur >= 0)[:, None]
                       & (tg < far[:, None]))
            sidx, svalid = select_first_k(include, K)
            t_k = jnp.where(svalid, jnp.take_along_axis(tg, sidx, axis=1), 0.0)
            dt_k = jnp.where(svalid,
                             jnp.take_along_axis(dtg, sidx, axis=1), 0.0)
            n_found = jnp.sum(svalid, axis=-1)
            # cursor: just past the K-th occupied sample when K were found
            # (unprobed space stays ahead of the cursor), else past the
            # whole probed window (raymarching.cu:390 cursor semantics)
            last_col = jnp.where(n_found >= K, sidx[:, K - 1] + 1, S_march)
            new_cur_b = jnp.take_along_axis(
                tg_ext, last_col[:, None], axis=1)[:, 0]
        # ---- field eval on exactly B*K slots ----
        xyz_k = (ro[:, None, :] + t_k[..., None] * rd[:, None, :]).reshape(B * K, 3)
        dirs_k = jnp.broadcast_to(rd[:, None, :], (B, K, 3)).reshape(B * K, 3)
        if with_exposure:
            exp_b = exposure[idx]
            exp_k = jnp.broadcast_to(
                exp_b[:, None, :], (B, K, exp_b.shape[-1])
            ).reshape(B * K, -1)
        else:
            exp_k = None
        sigmas, raws = _field_raws(model, params, xyz_k, dirs_k, exp_k)
        comp = composite_rays(
            sigmas.reshape(B, K), raws.reshape(B, K, -1), dt_k, t_k, svalid,
            T_threshold, T_start=1.0 - opacity[idx],
        )
        # ---- scatter results back to the full-chunk buffers ----
        # (idx rows are distinct even for sel=False padding — top_k
        # returns distinct positions — so .at[].add is collision-free)
        opa_b = jnp.where(sel, comp["opacity"], 0.0)
        opacity = opacity.at[idx].add(opa_b)
        depth = depth.at[idx].add(jnp.where(sel, comp["depth"], 0.0))
        rend = rend.at[idx].add(jnp.where(sel[:, None], comp["rend"], 0.0))
        cursor = cursor.at[idx].set(jnp.where(sel, new_cur_b, cursor[idx]))
        converged = (1.0 - (opacity[idx])) <= T_threshold
        alive_b = sel & ~converged & (new_cur_b < far)
        alive = alive.at[idx].set(jnp.where(sel, alive_b, alive[idx]))
        n_eff = jnp.sum(jnp.where(sel[:, None], svalid, False))
        return cursor, alive, opacity, depth, rend, n_eff

    def block_fn(r_dyn, params, occ_tables, rays_o, rays_d, t2,
                 cursor, alive, opacity, depth, rend, exposure=None):
        # r_dyn is a RUNTIME trip count (fori_loop lowers to while):
        # the host varies rounds-per-dispatch freely (wide regime 1,
        # narrow tail test_rounds_per_dispatch, budget-clamped last
        # dispatch) without multiplying compiled variants — the r4
        # ladder compiled a distinct program per (B, K, R) triple,
        # which is exactly the 160 s cold-render bill
        def body(_, carry):
            cursor, alive, opacity, depth, rend, n_eff = carry
            cursor, alive, opacity, depth, rend, ne = one_round(
                params, occ_tables, rays_o, rays_d, t2,
                cursor, alive, opacity, depth, rend, exposure)
            return cursor, alive, opacity, depth, rend, n_eff + ne
        carry = (cursor, alive, opacity, depth, rend,
                 jnp.zeros((), jnp.int32))
        carry = jax.lax.fori_loop(0, r_dyn, body, carry)
        cursor, alive, opacity, depth, rend, n_eff = carry
        return cursor, alive, opacity, depth, rend, n_eff, jnp.sum(alive)

    return jax.jit(block_fn)


# ---- concurrent bucket-ladder precompilation -----------------------
# The dense ladder needs ~9 (B, K) programs per chunk size; compiled
# serially on first render they were the 160 s cold start (r4 bench).
# All rungs share IDENTICAL input avals (B and K are constants baked
# into the traced program, not argument shapes), so every rung can be
# lowered+compiled concurrently in background threads the moment the
# driver knows N — overlapping the whole ladder build with the
# first full-width rounds' device execution.
# 3 workers, not 8: this image's compiles go through a remote-compile
# HTTP endpoint that drops connections under heavy concurrent load
# (observed: "response body closed before all bytes were read" killing
# the MAIN thread's train-step compile while 8 ladder compiles were in
# flight). 3 background compiles + the main thread stays reliable and
# still overlaps the ladder build with training/render execution.
_EXEC_POOL = ThreadPoolExecutor(max_workers=3)
_EXEC_FUTURES: dict = {}


def _compile_with_retry(fn, arg_avals, attempts=3):
    for i in range(attempts):
        try:
            return fn.lower(*arg_avals).compile()
        except Exception:
            if i == attempts - 1:
                raise
            import time as _time
            _time.sleep(1.0 + i)


def _avals_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def _bucket_ladder_BK(N, min_samples, S_march, use_sv):
    """Every (B, K) the dense-ladder driver can request for chunk N."""
    ladder, b = [], max(min(N, 256), 256)
    while b < N:
        ladder.append(b)
        b *= 2
    ladder.append(N)
    out = []
    for B in ladder:
        K = max(min(N // B, 64), min_samples)
        if B == N:
            K = min(2 * K, 64)
        if not use_sv:
            K = min(K, S_march)
        out.append((B, K))
    return out


def _exec_key(static_key, arg_avals):
    return (jax.default_backend(), static_key,
            tuple((tuple(a.shape), str(a.dtype))
                  for a in jax.tree_util.tree_leaves(arg_avals)))


def _bucket_exec(static_key, arg_avals):
    """AOT-compiled executable for one ladder rung, compiled in a
    background thread; falls back to the plain jit call on failure."""
    fut = _EXEC_FUTURES.get(_exec_key(static_key, arg_avals))
    if fut is None:
        fut = _submit_bucket_compile(static_key, arg_avals)
    try:
        return fut.result()
    except Exception:
        return _make_test_round_bucket_fn(*static_key)


def _bucket_ready(static_key, arg_avals) -> bool:
    """True iff this rung's executable is compiled and usable NOW."""
    fut = _EXEC_FUTURES.get(_exec_key(static_key, arg_avals))
    return fut is not None and fut.done() and fut.exception() is None


def _submit_bucket_compile(static_key, arg_avals):
    key = (jax.default_backend(), static_key,
           tuple((tuple(a.shape), str(a.dtype))
                 for a in jax.tree_util.tree_leaves(arg_avals)))
    fut = _EXEC_FUTURES.get(key)
    if fut is None:
        fn = _make_test_round_bucket_fn(*static_key)
        fut = _EXEC_POOL.submit(_compile_with_retry, fn, arg_avals)
        _EXEC_FUTURES[key] = fut
    return fut


@lru_cache(maxsize=32)
def _make_test_round_fn(mcfg, T_threshold, n_steps, budget, with_exposure):
    """Jitted one-round march+eval+composite, cached per static config
    so chunked/multi-image validation compiles exactly once."""
    from .ngp_mt import NGPMT

    model = NGPMT(mcfg)

    def round_fn(params, bitfield, rays_o, rays_d, t2,
                 cursor, alive, opacity, depth, rend, exposure=None):
        N = rays_o.shape[0]
        mres, new_cursor = march_rays_test_round(
            rays_o, rays_d, cursor, t2, alive, bitfield,
            cascades=mcfg.cascades, scale=mcfg.scale,
            exp_step_factor=mcfg.exp_step_factor, grid_size=mcfg.grid_size,
            max_samples=mcfg.max_samples, n_steps=n_steps,
            sample_budget=budget,
        )
        xyz = rays_o[mres.ray_id] + mres.t[:, None] * rays_d[mres.ray_id]
        dirs = rays_d[mres.ray_id]
        exp_c = exposure[mres.ray_id] if with_exposure else None
        sigmas, raws = _field_raws(model, params, xyz, dirs, exp_c)
        comp = composite_rays_compact(
            sigmas, raws, mres.dt, mres.t, mres.ray_id, mres.ray_start,
            mres.valid, N, T_threshold, T_start=1.0 - opacity,
        )
        opacity = opacity + comp["opacity"]
        depth = depth + comp["depth"]
        rend = rend + comp["rend"]
        converged = (1.0 - opacity) <= T_threshold
        exhausted = new_cursor >= t2
        alive = alive & ~converged & ~exhausted
        return new_cursor, alive, opacity, depth, rend, jnp.sum(mres.ray_count)

    return jax.jit(round_fn)


def prewarm_test_render(model, params, rcfg: RenderConfig, n_rays: int, *,
                        bitfield=None, sv_mask=None, sv_payload=None):
    """Submit background compiles for every bucket-ladder rung the test
    renderer will need for `n_rays` total rays (chunked by test_chunk).

    Call this before/at the start of training: compilation overlaps the
    whole training run on host threads, so the first validate/render
    pays ZERO ladder-compile latency instead of the 60-160 s cold start
    (the avals here must mirror render_test's buffer init exactly —
    pytree dict keys are sorted by jax, so insertion order is free).
    """
    cfg = model.cfg
    C = cfg.rend_channels
    sd = jax.ShapeDtypeStruct
    use_sv = (rcfg.march_coarse and sv_mask is not None
              and cfg.cascades == 1 and cfg.exp_step_factor == 0.0
              and cfg.grid_size % 8 == 0)
    p_avals = jax.tree_util.tree_map(
        lambda a: sd(jnp.shape(a), jnp.result_type(a)), params)
    occ_avals = ({"sv_mask": sd(jnp.shape(sv_mask), jnp.uint8),
                  "sv_payload": sd(jnp.shape(sv_payload), jnp.int32)}
                 if use_sv else
                 {"bitfield": sd(jnp.shape(bitfield), jnp.uint8)})
    min_samples = max(1 if cfg.exp_step_factor == 0 else 4,
                      rcfg.test_min_k)
    S_march = rcfg.test_march_window
    chunk = rcfg.test_chunk
    sizes = {min(chunk, n_rays - i) for i in range(0, n_rays, chunk)}
    for N in sizes:
        fv = sd((N,), jnp.float32)
        avals = (sd((), jnp.int32), p_avals, occ_avals,
                 sd((N, 3), jnp.float32), sd((N, 3), jnp.float32), fv,
                 fv, sd((N,), jnp.bool_), fv, fv,
                 sd((N, C), jnp.float32))
        for Bp, Kp in reversed(
                _bucket_ladder_BK(N, min_samples, S_march, use_sv)):
            skey = (cfg, rcfg.T_threshold, Bp, Kp, S_march, False, use_sv,
                    rcfg.test_sv_intervals)
            _submit_bucket_compile(skey, avals)


def render_test(
    model,
    params,
    bitfield,
    rays_o,
    rays_d,
    rcfg: RenderConfig,
    exposure: Optional[jnp.ndarray] = None,
    sv_mask: Optional[jnp.ndarray] = None,
    sv_payload: Optional[jnp.ndarray] = None,
):
    """Inference rendering via fixed-shape marching/compositing rounds
    (reference: models/rendering.py:46-149). Host-driven round loop; each
    round is one jitted computation with static shapes, cached across
    images/chunks.
    """
    cfg = model.cfg
    N = rays_o.shape[0]
    C = cfg.rend_channels

    hits_t = ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale)
    )
    t1 = hits_t[:, 0]
    t1 = jnp.where((t1 >= 0) & (t1 < cfg.near_dist), cfg.near_dist, t1)
    t2 = hits_t[:, 1]

    opacity = jnp.zeros(N)
    depth = jnp.zeros(N)
    rend = jnp.zeros((N, C))
    cursor = t1
    alive = t1 >= 0
    total_samples = jnp.zeros((), jnp.int32)

    if rcfg.test_layout == "bucket":
        # Alive-compacted rounds: bucket size follows the live count so
        # converged rays cost nothing. Per-ray samples per round follow
        # the reference's adaptive schedule
        # N_samples = max(min(N_rays//N_alive, 64), min_samples)
        # (reference: models/rendering.py:77-84) but floored at
        # rcfg.test_min_k: the reference's K=1 early rounds are tuned
        # for a GPU where each round is one cheap kernel; on TPU a
        # round has fixed dispatch + bucket-compaction overhead, so
        # bigger rounds win (behind-surface overshoot is masked by the
        # T-threshold in compositing and bounded by K per ray).
        min_samples = max(1 if cfg.exp_step_factor == 0 else 4,
                          rcfg.test_min_k)
        S_march = rcfg.test_march_window
        use_sv = (rcfg.march_coarse and sv_mask is not None
                  and cfg.cascades == 1 and cfg.exp_step_factor == 0.0
                  and cfg.grid_size % 8 == 0)
        occ_tables = ({"sv_mask": sv_mask, "sv_payload": sv_payload}
                      if use_sv else {"bitfield": bitfield})
        # Dense power-of-two bucket ladder (floor 256). The r4 warm
        # render trace showed the coarse {N, N/4, N/16} ladder running
        # ~9 FULL-width rounds (19M field evals for a 65k-ray chunk)
        # because n_alive sat between rungs: every round between N/4
        # and N alive rays padded up to B=N. A dense ladder costs more
        # distinct (B, K) compiles, but those are one-time via the
        # persistent compile cache (VERDICT r2's churn predates it).
        # kick off compilation of EVERY rung the ladder can request,
        # concurrently, before the first dispatch: the rungs share
        # input avals, so the whole ladder builds in background threads
        # while the full-width rounds execute (was: serial compile per
        # rung on first use = the 160 s cold render). Submitted widest
        # first — the order the crashing alive set needs them.
        base_args = (jnp.int32(1), params, occ_tables, rays_o, rays_d, t2,
                     cursor, alive, opacity, depth, rend)
        if exposure is not None:
            base_args = base_args + (exposure,)
        arg_avals = _avals_of(base_args)
        rungs = _bucket_ladder_BK(N, min_samples, S_march, use_sv)
        ladder = [b for b, _ in rungs]
        _ladder_K = dict(rungs)
        static_keys = {}
        for Bp, Kp in reversed(rungs):
            skey = (cfg, rcfg.T_threshold, Bp, Kp, S_march,
                    exposure is not None, use_sv, rcfg.test_sv_intervals)
            static_keys[(Bp, Kp)] = skey
            _submit_bucket_compile(skey, arg_avals)
        # no initial device->host count fetch: round 1 is full-width
        # for any plausible alive set, and every tunnel RTT costs
        # ~50-80 ms of wall time
        n_alive = N
        samples = 0
        first = True
        blind_left = max(rcfg.test_blind_rounds, 1)
        # One-round-stale alive counts: the device->host n_alive fetch
        # through the tunneled chip costs tens of ms, and fetching it
        # synchronously after every dispatch made the host gap ~40% of
        # warm render wall time (r4 trace: 0.97s device, 1.6s wall).
        # `alive` only ever SHRINKS during test rendering, so the count
        # from dispatch i-1 is a valid upper bound when choosing the
        # bucket for dispatch i+1 — each round still processes every
        # alive ray (select_first_k fills B >= n_alive slots), the
        # bucket is just occasionally one rung too wide. The fetch of
        # round i-1's count overlaps round i's device execution.
        pending_alive_dev = None
        while samples < cfg.max_samples and n_alive > 0:
            # opportunistic rung choice: the finest ALREADY-COMPILED
            # rung >= n_alive, falling back wider. On a true-cold
            # render only the full-width rung (needed by round 1
            # regardless) blocks on its compile; narrow rungs join the
            # ladder as their background compiles land, so compile
            # latency stays off the critical path (the r4/r5 cold
            # renders serialized ~9 rung compiles, 160 s).
            candidates = [b for b in ladder if b >= n_alive]
            B = next(
                (b for b in candidates
                 if _bucket_ready(static_keys[(b, _ladder_K[b])], arg_avals)),
                N)
            # K per rung comes from _bucket_ladder_BK: the reference's
            # adaptive N//B capped at 64, doubled for full-width rounds
            # (two K-sample full-width dispatches through the ~65 ms
            # tunnel do the same device work as one 2K round), and
            # clamped to the S_march probe window on the non-sv path
            # (top_k requires K <= S_march; windows < 64 crashed in r4)
            K = _ladder_K[B]
            # Wide dispatches (B > N/8) run ONE round each so the host
            # re-buckets while the alive set is crashing — one wasted
            # full-width round costs ~100 ms, dwarfing the ~ms
            # dispatch round-trip. Narrow dispatches fuse
            # `test_rounds_per_dispatch` rounds per call so dispatch
            # overhead stops dominating the tail.
            R = 1 if (first or B > N // 8) else max(
                rcfg.test_rounds_per_dispatch, 1)
            R = min(R, max((cfg.max_samples - samples) // K, 1))
            round_fn = _bucket_exec(static_keys[(B, K)], arg_avals)
            cursor, alive, opacity, depth, rend, n_eff, n_alive_dev = round_fn(
                jnp.int32(R), params, occ_tables, rays_o, rays_d, t2,
                cursor, alive, opacity, depth, rend,
                *((exposure,) if exposure is not None else ()),
            )
            total_samples = total_samples + n_eff
            samples += K * R
            first = False
            if B > N // 8:
                # wide regime: the alive set can crash 20x in one round
                # (most rays converge on their first 32-64 occupied
                # samples), and a one-round-stale count then buys a
                # WASTED full-width round (~150 ms device) to save a
                # ~65 ms fetch — block for the true count, except
                # during the blind prefix (see test_blind_rounds)
                blind_left -= 1
                if blind_left <= 0:
                    n_alive = int(n_alive_dev)
                    pending_alive_dev = None
            else:
                # narrow tail: rounds are cheap, dispatch latency
                # dominates — pipeline with one-round-stale counts
                if pending_alive_dev is not None:
                    n_alive = int(pending_alive_dev)
                pending_alive_dev = n_alive_dev
            if os.environ.get("NCNERF_RENDER_DEBUG"):
                # n_alive is stale-by-one during the blind prefix and
                # narrow-tail pipelining — label it so ladder traces
                # are interpretable
                fresh = (B > N // 8 and blind_left <= 0)
                print(f"[render] B={B} K={K} R={R} n_alive_next={n_alive}"
                      f" ({'fresh' if fresh else 'stale'},"
                      f" blind_left={max(blind_left, 0)})",
                      file=sys.stderr)
        results = {"opacity": opacity, "depth": depth,
                   "total_samples": total_samples}
        results.update(_split_rend(model, rend))
        bg = _bg_color(model, jax.random.PRNGKey(0), False)
        results["rgb"] = results["rgb"] + bg[None, :] * (1.0 - opacity[:, None])
        return results

    n_steps = rcfg.test_n_samples
    # full per-round budget: rcfg.sample_budget is a TRAIN-time eval cap
    # and must not clamp inference rounds (a starved budget silently
    # drops samples and corrupts the composite). NOTE: flat-layout round
    # memory therefore scales with test_chunk * test_n_samples — shrink
    # rcfg.test_chunk if a large chunk OOMs on this path.
    budget = N * n_steps
    round_fn = _make_test_round_fn(
        cfg, rcfg.T_threshold, n_steps, budget, exposure is not None)

    samples = 0
    while samples < cfg.max_samples:
        cursor, alive, opacity, depth, rend, n_eff = round_fn(
            params, bitfield, rays_o, rays_d, t2,
            cursor, alive, opacity, depth, rend,
            *((exposure,) if exposure is not None else ()),
        )
        total_samples = total_samples + n_eff
        samples += n_steps
        if not bool(jnp.any(alive)):
            break

    results = {"opacity": opacity, "depth": depth, "total_samples": total_samples}
    results.update(_split_rend(model, rend))
    bg = _bg_color(model, jax.random.PRNGKey(0), False)
    results["rgb"] = results["rgb"] + bg[None, :] * (1.0 - opacity[:, None])
    return results


def render(model, params, bitfield, rays_o, rays_d, key, rcfg, test_time=False, **kw):
    """Dispatch (reference: models/rendering.py:10-42)."""
    if test_time:
        return render_test(model, params, bitfield, rays_o, rays_d, rcfg,
                           exposure=kw.get("exposure"),
                           sv_mask=kw.get("sv_mask"),
                           sv_payload=kw.get("sv_payload"))
    return render_train(
        model, params, bitfield, rays_o, rays_d, key, rcfg,
        global_step=kw.get("global_step", 0),
        depth_gt=kw.get("depth_gt"),
        exposure=kw.get("exposure"),
        coarse_occ=kw.get("coarse_occ"),
        sv_mask=kw.get("sv_mask"),
        sv_payload=kw.get("sv_payload"),
        bootstrap=kw.get("bootstrap", False),
    )
