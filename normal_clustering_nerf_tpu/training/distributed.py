"""Sharded training step: rays over chips, params replicated.

The multi-chip strategy (SURVEY.md §2.4/§5.8): a 1-D 'rays' mesh; each
chip samples and renders its own sub-batch of rays on-device, gradients
are pmean-reduced over ICI inside shard_map (XLA overlaps the
collective with the backward pass), and the replicated AdamW update is
computed identically everywhere. The periodic occupancy refresh is
likewise shard_mapped with a pmax merge of per-chip grids
(models/occupancy.py merge_across_chips).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..datasets.sampler import RaySampler
from ..models.occupancy import OccupancyGrid


def make_sharded_train_step(trainer, mesh, axis_name: str = "rays",
                            bootstrap: bool = False):
    """Build a jitted shard_map step over `mesh` from a Trainer.

    State and scene are replicated; each chip draws batch_size/n_chips
    rays. Returns step_fn(state, scene) -> (state, metrics).
    """
    n = mesh.devices.size
    cfg = trainer.cfg
    assert cfg.data.batch_size % n == 0, (
        f"batch_size {cfg.data.batch_size} must divide over {n} chips"
    )
    local_sampler = RaySampler(
        cfg.data.ray_sampling_strategy,
        cfg.data.batch_size // n,
        trainer.scene_train.img_wh,
        trainer.scene_train.n_images,
        max_expand=cfg.data.triang_max_expand,
        patch_size=cfg.data.patch_size,
        n_random_poses=(
            trainer.random_poses.shape[0]
            if trainer.random_poses is not None else 0
        ),
    )

    def body(state, scene):
        return trainer.train_step_core(
            state, scene, local_sampler, axis_name=axis_name,
            bootstrap=bootstrap,
        )

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_train_chunk(trainer, mesh, n_steps: int,
                             axis_name: str = "rays",
                             bootstrap: bool = False):
    """Like make_sharded_train_step, but scans `n_steps` optimization
    steps inside one shard_mapped dispatch (the occupancy-refresh
    interval is the natural chunk boundary)."""
    n = mesh.devices.size
    cfg = trainer.cfg
    assert cfg.data.batch_size % n == 0
    local_sampler = RaySampler(
        cfg.data.ray_sampling_strategy,
        cfg.data.batch_size // n,
        trainer.scene_train.img_wh,
        trainer.scene_train.n_images,
        max_expand=cfg.data.triang_max_expand,
        patch_size=cfg.data.patch_size,
        n_random_poses=(
            trainer.random_poses.shape[0]
            if trainer.random_poses is not None else 0
        ),
    )
    chunk_fn = trainer._make_chunk_fn(
        n_steps, sampler=local_sampler, axis_name=axis_name,
        bootstrap=bootstrap)
    sharded = shard_map(
        chunk_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_occ_update(trainer, mesh, warmup: bool,
                            axis_name: str = "rays"):
    """Occupancy refresh where each chip samples different cells and the
    grids are pmax-merged (union of per-chip evidence)."""

    def body(occ, params, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        occ2 = trainer._occ_update_impl(occ, params, key, warmup=warmup)
        return OccupancyGrid.merge_across_chips(occ2, axis_name)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
