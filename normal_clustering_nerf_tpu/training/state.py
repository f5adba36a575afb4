"""Functional train state and optimizer assembly.

Replaces the reference's Lightning module state + apex FusedAdam
(reference: train_nerf.py:237-291): parameters, optimizer state,
occupancy grid and PRNG key live in one explicit pytree; the optimizer
is optax AdamW (eps=1e-15, decoupled weight decay: 0 for the hash
table, 1e-6 for network weights — train_nerf.py:284-286) with cosine
annealing stepped per epoch over num_epochs (train_nerf.py:287-291) and
global-norm gradient clipping (grad_clip=0.05, opt.py:159-160).
Optional parameter groups mirror the reference: per-image extrinsic
deltas dR/dT at lr 1e-6 (train_nerf.py:267-270), a global normal-frame
rotation, and the Manhattan-SDF theta_WF (train_nerf.py:276-280).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.occupancy import OccupancyState


class TrainState(NamedTuple):
    params: Dict[str, Any]       # {'model': ..., ['dR','dT','theta_WF','dR_glob']}
    opt_state: Any
    occ: OccupancyState
    step: jnp.ndarray            # () int32
    key: jnp.ndarray


def cosine_epoch_schedule(base_lr: float, num_epochs: int, steps_per_epoch: int):
    """CosineAnnealingLR(T_max=num_epochs, eta_min=0) stepped per epoch."""
    def sched(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(math.pi * epoch / num_epochs))
    return sched


def build_optimizer(cfg: TrainConfig, params: Dict[str, Any]):
    o = cfg.optim
    sched = cosine_epoch_schedule(o.lr, o.num_epochs, o.steps_per_epoch)

    def wd_mask(p):
        # hash table gets no weight decay (train_nerf.py:284-285)
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(k, "key", None) == "hash_table" for k in path
            ),
            p,
        )

    model_tx = optax.adamw(
        learning_rate=sched, eps=o.adam_eps,
        weight_decay=o.weight_decay_net, mask=wd_mask,
    )
    txs = {"model": model_tx}
    labels = {"model": "model"}
    for k in params:
        if k == "model":
            continue
        if k in ("dR", "dT"):
            txs.setdefault("ext", optax.adam(1e-6, eps=o.adam_eps))
            labels[k] = "ext"
        elif k == "dR_glob":
            txs.setdefault(
                "dR_glob", optax.adam(o.lr_dR_norm_glob, eps=o.adam_eps))
            labels[k] = "dR_glob"
        else:  # theta_WF at base lr (train_nerf.py:279-280)
            txs.setdefault("theta", optax.adam(sched, eps=o.adam_eps))
            labels[k] = "theta"
    tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip),
        optax.multi_transform(txs, labels),
    )
    return tx


def create_train_state(cfg: TrainConfig, model, occ_grid, key, n_images: int):
    k_model, k_state = jax.random.split(key)

    # one jitted graph for the whole init: on tunneled TPU backends every
    # eager op is a separate (slow) remote compile
    def _init(k):
        params: Dict[str, Any] = {"model": model.init(k)}
        if cfg.optim.optimize_ext:
            params["dR"] = jnp.zeros((n_images, 3))
            params["dT"] = jnp.zeros((n_images, 3))
        if cfg.optim.lr_dR_norm_glob > 0:
            params["dR_glob"] = jnp.zeros((3,))  # axis-angle identity coding
        if cfg.loss.manhattan_nerf_w > 0:
            params["theta_WF"] = jnp.zeros(())
        return params

    params = jax.jit(_init)(k_model)
    tx = build_optimizer(cfg, params)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        occ=occ_grid.init_state(),
        step=jnp.zeros((), jnp.int32),
        key=k_state,
    ), tx
