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
from ..models.triplane import (
    TRIPLANE_LAYOUT_VERSION, convert_triplane_params_v1_to_v2)

_LAYOUT_FILE = "layout_version.json"


def _write_layout_tag(path: str):
    import json
    with open(os.path.join(path, _LAYOUT_FILE), "w") as f:
        json.dump({"triplane_layout": TRIPLANE_LAYOUT_VERSION}, f)


def _read_layout_tag(path: str) -> int:
    """Layout version recorded in a checkpoint dir; absent tag = v1
    (pre-versioning checkpoints are all slot-major)."""
    import json
    p = os.path.join(path, _LAYOUT_FILE)
    if not os.path.exists(p):
        return 1
    with open(p) as f:
        return int(json.load(f).get("triplane_layout", 1))


def _maybe_convert_layout(params, version: int):
    """Upgrade restored params to the current triplane row layout.

    Param shapes are identical across layout versions, so without this
    a v1 (slot-major-lane) checkpoint restores silently and decodes
    scrambled features (r4 advisor finding)."""
    if version == TRIPLANE_LAYOUT_VERSION:
        return params
    if version > TRIPLANE_LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint triplane layout v{version} is newer than this "
            f"build's v{TRIPLANE_LAYOUT_VERSION} — refusing to guess")
    if not isinstance(params, dict):
        return params
    if "model" in params:  # TrainState params nest model under 'model'
        params = dict(params)
        params["model"] = _maybe_convert_layout(params["model"], version)
        return params
    ht = params.get("hash_table")
    if isinstance(ht, dict) and "planes" in ht and "grid3d" in ht:
        params = dict(params)
        params["hash_table"] = convert_triplane_params_v1_to_v2(ht)
    return params


def save_checkpoint(path: str, state: TrainState):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    _write_layout_tag(path)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, template)
    version = _read_layout_tag(path)
    if version != TRIPLANE_LAYOUT_VERSION:
        state = state._replace(
            params=_maybe_convert_layout(state.params, version))
    return state


def save_weights(path: str, params):
    """Weights-only artifact (numpy archive, host-portable)."""
    flat = {"__triplane_layout__": np.int32(TRIPLANE_LAYOUT_VERSION)}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_weights(path: str, params):
    """Restore params saved by save_weights into a matching template."""
    data = np.load(path)
    version = (int(data["__triplane_layout__"])
               if "__triplane_layout__" in data.files else 1)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for kp, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        if name in data.files:
            new_leaves.append(data[name])
        else:
            new_leaves.append(leaf)
    restored = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return _maybe_convert_layout(restored, version)


def slim_state(state: TrainState) -> dict:
    """Strip optimizer + occupancy buffers (reference: utils.py:29-39)."""
    return {"params": jax.device_get(state.params),
            "step": int(state.step)}
