"""Multi-task NeRF loss with Manhattan normal-clustering self-supervision.

TPU-native re-design of the reference NeRFMTLoss (reference:
losses.py:169-587). Everything is jittable: Python branching only on
static config; data-dependent validity becomes masked means and
`jnp.where` guards (replacing the reference's print-and-zero
`_loss_validity_filter`, losses.py:246-262); the FAISS CPU round-trip
becomes the on-device clustering of ops/kmeans.py.

Reference quirks handled via LossConfig flags (see config.py):
  * losses.py:290 feeds `ts` where the distortion loss expects `ws`
    (`distortion_ts_bug_compat`).
  * losses.py:453-455's member-discard is a silent no-op in torch
    (`discard_far_members` applies the intended discard when True).
  * losses.py:227-231 contains a self-contradictory assert that makes
    the Manhattan-SDF baseline path unreachable upstream; here it works.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import LossConfig, ModelConfig
from .datasets.normals import extract_normals_from_ray_batch
from .ops.distortion import distortion_loss, distortion_loss_dense
from .ops.kmeans import normals_clustering


def _masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def _safe_unit(v, eps=1e-12):
    """Zero-safe normalize with NaN-free gradient (double-where)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = sq > eps
    safe = jnp.where(ok, sq, 1.0)
    return jnp.where(ok, v / jnp.sqrt(safe), 0.0)


def _finite_or_zero(loss):
    """NaN/Inf guard (reference: losses.py:246-262)."""
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def w_sched(w: float, step, start: float, grow: float):
    """Ramp a loss weight from 0 to w over `grow` steps after `start`
    (reference: losses.py:213-217)."""
    return jnp.clip((step - start) * (w / max(grow, 1e-12)), 0.0, w)


def triang_idx(seq_len: int) -> Dict[str, np.ndarray]:
    """x1/x2/x3 indices for flat triangle batches (losses.py:299-305)."""
    assert seq_len % 3 == 0
    pix = np.arange(seq_len, dtype=np.int32).reshape(-1, 3)
    return {"x1": pix[:, 0], "x2": pix[:, 1], "x3": pix[:, 2]}


def patch_triang_idx(seq_len: int, patch_area: int, offsets_local) -> Dict[str, np.ndarray]:
    """x1/x2/x3 indices for patch batches (losses.py:307-313)."""
    assert seq_len % patch_area == 0
    pix = np.arange(seq_len, dtype=np.int32).reshape(-1, patch_area)
    return {
        k: pix[:, np.asarray(offsets_local[k])].reshape(-1)
        for k in ("x1", "x2", "x3")
    }


def _cross_entropy(logits, labels_shifted, n_cls, weight=None, label_smoothing=0.0):
    """torch.nn.CrossEntropyLoss(ignore_index=-1[, weight, label_smoothing])
    semantics on already-shifted labels (void class -> -1,
    losses.py:240-242)."""
    valid = labels_shifted >= 0
    lab = jnp.clip(labels_shifted, 0, n_cls - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(lab, n_cls)
    q = onehot * (1.0 - label_smoothing) + label_smoothing / n_cls
    if weight is not None:
        w_c = jnp.asarray(weight)
        per = -jnp.sum(q * w_c[None, :] * logp, axis=-1)
        denom = jnp.sum(jnp.where(valid, w_c[lab], 0.0))
    else:
        per = -jnp.sum(q * logp, axis=-1)
        denom = jnp.sum(valid)
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(denom, 1e-12)


def _clustering_losses(norm_D_C, lcfg: LossConfig, key, step):
    """The paper's contribution (reference: losses.py:419-509)."""
    tres = lcfg.norm_can_tres
    t_similar = 1.0 - tres

    finite = jnp.all(jnp.isfinite(norm_D_C), axis=-1)
    nonzero = jnp.sum(jnp.abs(norm_D_C), axis=-1) != 0.0
    valid = finite & nonzero
    normals = jnp.where(valid[:, None], norm_D_C, 0.0)

    clus = normals_clustering(
        jax.lax.stop_gradient(normals), valid, key,
        K=lcfg.cluster_K, niter=lcfg.cluster_niter,
        t_similar=t_similar, merge_clusters=True, find_opposite=True,
    )
    assign = clus.assign_new
    # flip opposite-cluster members into the positive cluster
    # (losses.py:444-447)
    flip = assign < 0
    normals = jnp.where(flip[:, None], -normals, normals)
    assign = jnp.abs(assign)

    member = [assign == (g + 1) for g in range(3)]
    if lcfg.discard_far_members:
        # intended (but upstream-no-op) member discard (losses.py:449-455)
        for g in range(3):
            near = (
                1.0 - jnp.sum(normals * clus.centroids3[g][None, :], axis=-1)
            ) <= tres
            member[g] = member[g] & near

    counts = [jnp.sum(m) for m in member]
    # gradient-carrying centroids from member means (losses.py:461-466)
    cs = []
    for g in range(3):
        mean = _masked_mean(normals, member[g][:, None], axis=0)
        cs.append(_safe_unit(mean[None, :])[0])
    c1, c2, c3 = cs

    loss_ort = (
        jnp.abs(jnp.sum(c1 * c2))
        + jnp.abs(jnp.sum(c1 * c3))
        + jnp.abs(jnp.sum(c2 * c3))
    ) / 3.0
    loss_centr_dot = sum(
        1.0 - _masked_mean(jnp.sum(normals * cs[g][None, :], axis=-1), member[g])
        for g in range(3)
    ) / 3.0
    loss_centr_l1 = sum(
        _masked_mean(jnp.sum(jnp.abs(normals - cs[g][None, :]), axis=-1), member[g])
        for g in range(3)
    ) / 3.0

    # all three clusters must be non-empty, else the reference's means
    # are NaN and the validity filter zeroes the components
    ok = (counts[0] > 0) & (counts[1] > 0) & (counts[2] > 0)

    out = {}
    out["norm_D_C_ort_dot"] = jnp.where(
        ok, w_sched(lcfg.norm_D_C_ort_dot_w, step, lcfg.norm_can_start,
                    lcfg.norm_can_grow) * loss_ort, 0.0)
    out["norm_D_C_centr_dot"] = jnp.where(
        ok, w_sched(lcfg.norm_D_C_centr_dot_w, step, lcfg.norm_can_start,
                    lcfg.norm_can_grow) * loss_centr_dot, 0.0)
    out["norm_D_C_centr_L1"] = jnp.where(
        ok, w_sched(lcfg.norm_D_C_centr_L1_w, step, lcfg.norm_can_start,
                    lcfg.norm_can_grow) * loss_centr_l1, 0.0)

    # canonical-axis snapping (losses.py:480-502)
    if lcfg.norm_D_C_can_dot_w > 0 or lcfg.norm_D_C_can_L1_w > 0:
        can = jnp.asarray(
            [[1., 0., 0.], [-1., 0., 0.], [0., 1., 0.],
             [0., -1., 0.], [0., 0., 1.], [0., 0., -1.]]
        )
        c_mat = jnp.stack([c1, c2, c3])                     # (3, 3)
        sim = 1.0 - c_mat @ can.T                           # (3, 6)
        cond = sim < tres * 3.0
        any_snap = jnp.any(cond)
        dots = c_mat @ can.T                                # (3, 6)
        l1 = jnp.sum(
            jnp.abs(c_mat[:, None, :] - can[None, :, :]), axis=-1
        )                                                   # (3, 6)
        can_dot = 1.0 - _masked_mean(dots, cond)
        can_l1 = _masked_mean(l1, cond)
        out["norm_D_C_can_dot"] = jnp.where(
            ok & any_snap,
            w_sched(lcfg.norm_D_C_can_dot_w, step, lcfg.norm_can_start,
                    lcfg.norm_can_grow) * can_dot, 0.0)
        out["norm_D_C_can_L1"] = jnp.where(
            ok & any_snap,
            w_sched(lcfg.norm_D_C_can_L1_w, step, lcfg.norm_can_start,
                    lcfg.norm_can_grow) * can_l1, 0.0)
    return {k: _finite_or_zero(v) for k, v in out.items()}


def compute_losses(
    pred: Dict,
    target: Dict,
    lcfg: LossConfig,
    mcfg: ModelConfig,
    *,
    step,
    key,
    ray_sampling_strategy: str = "all_images",
    random_tr_poses: bool = False,
    patch_area: Optional[int] = None,
    offsets_local: Optional[Dict] = None,
    theta_WF=None,
) -> Dict[str, jnp.ndarray]:
    """All loss components + 'total' (reference: losses.py:244-587).

    Args:
      pred: render_train results.
      target: batch dict with 'rgb' and optional labels.
      step: global step (traced ok).
    """
    loss_d: Dict[str, jnp.ndarray] = {}
    gt_l = target["rgb"].shape[0]
    unsup_start = gt_l if random_tr_poses else 0
    n_rays = pred["rgb"].shape[0]
    n_unsup = n_rays - unsup_start

    triang = ray_sampling_strategy in (
        "all_images_triang", "same_image_triang", "all_images_triang_val"
    )
    triang_patch = ray_sampling_strategy in (
        "all_images_triang_patch", "same_image_triang_patch"
    )
    x123_gt = x123_unsup = None
    if triang:
        x123_gt = triang_idx(gt_l)
        x123_unsup = triang_idx(n_unsup)
    elif triang_patch:
        x123_gt = patch_triang_idx(gt_l, patch_area, offsets_local)
        x123_unsup = patch_triang_idx(n_unsup, patch_area, offsets_local)

    pred_norm_depth = mcfg.pred_norm_depth
    norm_depth_gt = norm_depth_unsup = None
    if pred_norm_depth:
        # depth-normal extraction needs pixel triangles
        # (reference: losses.py:219-221 asserts a *_triang strategy)
        assert x123_gt is not None, (
            "pred_norm_depth requires a *_triang/_triang_patch "
            f"ray_sampling_strategy, got {ray_sampling_strategy!r}"
        )
        norm_depth_gt = extract_normals_from_ray_batch(
            pred["rays_o"][:gt_l], pred["rays_d"][:gt_l],
            pred["depth"][:gt_l], x123_gt,
        )
        norm_depth_unsup = extract_normals_from_ray_batch(
            pred["rays_o"][unsup_start:], pred["rays_d"][unsup_start:],
            pred["depth"][unsup_start:], x123_unsup,
        )

    # RGB photometric (losses.py:349-355)
    rgb_loss = jnp.mean((pred["rgb"][:gt_l] - target["rgb"]) ** 2)
    loss_d["rgb"] = _finite_or_zero(rgb_loss)

    # opacity entropy (losses.py:358-362)
    if lcfg.opacity_w > 0:
        o = pred["opacity"] + 1e-10
        loss_d["opacity"] = _finite_or_zero(
            lcfg.opacity_w * jnp.mean(-o * jnp.log(o))
        )

    # distortion (losses.py:365-369; ws-vs-ts quirk via config)
    if lcfg.distortion_w > 0:
        ws = pred["ts"] if lcfg.distortion_ts_bug_compat else pred["ws"]
        if ws.ndim == 2:
            # dense (N, K) per-ray layout from the fast march path
            dl = distortion_loss_dense(
                ws, pred["deltas"], pred["ts"], pred["sample_valid"])
        else:
            dl = distortion_loss(
                ws, pred["deltas"], pred["ts"], pred["ray_id"],
                pred["ray_start"], pred["sample_valid"], n_rays,
            )
        loss_d["distortion"] = _finite_or_zero(lcfg.distortion_w * jnp.mean(dl))

    # depth L2 on valid GT (losses.py:372-385)
    if lcfg.depth_w > 0:
        d_t = target["depth"]
        m = d_t > 0
        loss_d["depth"] = _finite_or_zero(
            lcfg.depth_w * _masked_mean((pred["depth"][:gt_l] - d_t) ** 2, m)
        )

    # normals-from-depth supervision (losses.py:388-408)
    if lcfg.norm_depth_L1_w > 0 or lcfg.norm_depth_dot_w > 0:
        gt_key = "normals_depth" if lcfg.norm_GT_depth else "normals"
        nom_tar = target[gt_key][x123_gt["x1"]]
        m = jnp.sum(jnp.abs(nom_tar), axis=-1) > 0
        if lcfg.norm_depth_L1_w > 0:
            l1 = _masked_mean(
                jnp.sum(jnp.abs(norm_depth_gt - nom_tar), axis=-1), m
            )
            loss_d["norm_D_L1"] = _finite_or_zero(lcfg.norm_depth_L1_w * l1)
        if lcfg.norm_depth_dot_w > 0:
            # cosine-similarity form (losses.py:208)
            nd = _safe_unit(norm_depth_gt)
            nt = _safe_unit(nom_tar)
            dot = _masked_mean(1.0 - jnp.sum(nd * nt, axis=-1), m)
            loss_d["norm_D_dot"] = _finite_or_zero(lcfg.norm_depth_dot_w * dot)

    # RegNeRF depth smoothness on unsup rays (losses.py:411-417)
    if lcfg.reg_depth_w > 0:
        d_u = pred["depth"][unsup_start:]
        reg = (d_u[x123_unsup["x1"]] - d_u[x123_unsup["x2"]]) ** 2
        reg += (d_u[x123_unsup["x1"]] - d_u[x123_unsup["x3"]]) ** 2
        gated = jnp.where(step > lcfg.norm_can_start, jnp.mean(reg), 0.0)
        loss_d["reg_depth"] = _finite_or_zero(lcfg.reg_depth_w * gated)

    # normal clustering (losses.py:419-509)
    clustering_on = (
        lcfg.norm_D_C_ort_dot_w > 0 or lcfg.norm_D_C_centr_dot_w > 0
        or lcfg.norm_D_C_centr_L1_w > 0 or lcfg.norm_D_C_can_dot_w > 0
        or lcfg.norm_D_C_can_L1_w > 0
    )
    if clustering_on:
        cl = _clustering_losses(norm_depth_unsup, lcfg, key, step)
        in_window = (step <= lcfg.norm_can_end) | (lcfg.norm_can_end == -1)
        for k, v in cl.items():
            loss_d[k] = jnp.where(in_window, v, 0.0)

    # Manhattan-SDF wall/floor baseline (losses.py:511-566)
    if lcfg.manhattan_nerf_w > 0:
        sem_pred = pred["sem"][:gt_l][x123_gt["x1"]]
        sem_tgt = target["semantics_WF"][x123_gt["x1"]].astype(jnp.int32)
        soft = jax.nn.softmax(sem_pred, axis=-1)
        wf_ce = _cross_entropy(
            sem_pred, sem_tgt - 1, 3,
            weight=[1.0, 1.0, 0.3], label_smoothing=0.1,
        )
        loss_d["sem_WF"] = _finite_or_zero(lcfg.sem_w * wf_ce)

        wall = sem_tgt == 1
        floor = sem_tgt == 2
        nD = norm_depth_gt
        theta = theta_WF if theta_WF is not None else jnp.zeros(())
        floor_term = 1.0 - nD[:, 2]                       # Eq. 8
        cos = nD[:, 0] * jnp.cos(theta) + nD[:, 1] * jnp.sin(theta)
        wall_term = jnp.abs(nD[:, 2]) + jnp.minimum(       # Eq. 9
            jnp.abs(cos), jnp.minimum(jnp.abs(1 - cos), jnp.abs(1 + cos))
        )
        joint = (
            _masked_mean(soft[:, 1] * floor_term, floor)
            * (jnp.sum(floor) > 0)
            + _masked_mean(soft[:, 0] * wall_term, wall)
            * (jnp.sum(wall) > 0)
        )                                                  # Eq. 13
        geo = (
            _masked_mean(floor_term, floor) * (jnp.sum(floor) > 0)
            + _masked_mean(jnp.abs(nD[:, 2]), wall) * (jnp.sum(wall) > 0)
        )
        wf = jnp.where(step > lcfg.norm_can_start, joint, geo)
        any_wf = (jnp.sum(floor) > 0) | (jnp.sum(wall) > 0)
        loss_d["norm_WF"] = _finite_or_zero(
            jnp.where(any_wf, lcfg.manhattan_nerf_w * wf, 0.0)
        )

    # semantic CE (losses.py:569-573)
    if lcfg.sem_w > 0 and lcfg.manhattan_nerf_w == 0:
        sem_loss = _cross_entropy(
            pred["sem"][:gt_l],
            target["semantics"].astype(jnp.int32) - 1,
            mcfg.n_sem_cls,
        )
        loss_d["sem"] = _finite_or_zero(lcfg.sem_w * sem_loss)

    loss_d["total"] = sum(loss_d.values())
    return loss_d
