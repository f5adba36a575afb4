"""Device-mesh construction and sharding specs.

The framework's parallelism model (SURVEY.md §2.4/§5.8), replacing the
reference's Lightning DDP (reference: train_nerf.py:950-952): a named
`jax.sharding.Mesh` with a 'rays' axis; ray batches are batch-sharded
across chips, parameters and the occupancy grid replicated; gradient
all-reduce is a `psum` inside shard_map which XLA overlaps with the
backward pass over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Tuple[int, ...] = (-1,),
    axis_names: Tuple[str, ...] = ("rays",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the visible devices; -1 infers the axis size."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Rays sharded over the leading axis; everything else replicated."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
