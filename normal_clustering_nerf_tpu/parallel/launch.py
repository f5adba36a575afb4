"""Multi-host bring-up.

SLURM-free launcher replacing the reference's job-script generators for
intra-job parallelism (reference: experiments/*/train_one_euler.py):
`jax.distributed.initialize` connects the hosts of a pod slice; the
mesh in mesh.py then spans all chips of all hosts and the same
shard_map training step runs unchanged (gradients psum over ICI/DCN).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or standard env vars.

    No-op when single-process (num_processes in {None, 0, 1} and no
    coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
