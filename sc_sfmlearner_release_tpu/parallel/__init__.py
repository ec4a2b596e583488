from .mesh import make_mesh, shard_batch, replicate, batch_sharding, device_prefetch

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding", "device_prefetch"]
