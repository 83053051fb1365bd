from .mesh import get_mesh, shard_batch, replicate, device_count

__all__ = ["get_mesh", "shard_batch", "replicate", "device_count"]
