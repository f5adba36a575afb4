"""TPU-native framework for Instant-NGP-style multi-task NeRF with
surface-normal clustering (Manhattan-world self-supervision).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nikola3794/normal-clustering-nerf (ICCV 2023). The compute path is
functional JAX with static shapes; rendering uses dense masked sample
buffers instead of the reference's atomically-compacted ragged buffers
(reference: models/csrc/raymarching.cu:237-241), which is both
deterministic and XLA-friendly. Parallelism is a `jax.sharding.Mesh`
with rays batch-sharded over chips and parameters replicated
(replacing the reference's Lightning DDP, train_nerf.py:950-952).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
