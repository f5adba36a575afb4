from .mesh import make_mesh, shard_batch_spec  # noqa: F401
from .launch import initialize_multihost  # noqa: F401
