from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    device_prefetch,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "device_prefetch",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "shard_batch",
]
