from .normals import (  # noqa: F401
    extract_normals_from_depth_batch,
    extract_normals_from_ray_batch,
)


def get_dataset(name: str):
    """Dataset registry (reference: datasets/__init__.py:6-8)."""
    if name == "hypersim":
        from .hypersim import HypersimDataset
        return HypersimDataset
    if name == "scannet_manhattan":
        from .scannet_manhattan import ScanNetManhattanDataset
        return ScanNetManhattanDataset
    if name == "replica_semnerf":
        from .replica_semnerf import ReplicaSemNerfDataset
        return ReplicaSemNerfDataset
    if name == "synthetic":
        from .synthetic import SyntheticDataset
        return SyntheticDataset
    raise KeyError(name)
