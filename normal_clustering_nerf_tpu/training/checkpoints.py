"""Checkpoint save/load/slim via orbax.

TPU-native equivalent of the reference's Lightning ModelCheckpoint +
ckpt utils (reference: train_nerf.py:889-899, utils.py:4-39): the full
TrainState pytree (params, optimizer, occupancy grid, step, key) is
checkpointed; `slim_state` strips the non-essential buffers the way
`slim_ckpt` strips density_grid/grid_coords/directions (utils.py:29-39);
`load_weights` restores model params only (the reference's
--weight_path path, utils.py:21-26).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def save_checkpoint(path: str, state: TrainState):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def save_weights(path: str, params):
    """Weights-only artifact (numpy archive, host-portable)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_weights(path: str, params):
    """Restore params saved by save_weights into a matching template."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for kp, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        if name in data.files:
            new_leaves.append(data[name])
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def slim_state(state: TrainState) -> dict:
    """Strip optimizer + occupancy buffers (reference: utils.py:29-39)."""
    return {"params": jax.device_get(state.params),
            "step": int(state.step)}
