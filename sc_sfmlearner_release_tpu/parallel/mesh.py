"""Device mesh + sharding helpers (SPMD data parallelism).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(/root/reference/train.py:168-169). The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``: the batch axis is sharded over the ``data`` mesh axis,
parameters are replicated, and XLA inserts the gradient/BN-stat collectives
over ICI automatically when the train step is jitted with these shardings
(SURVEY.md §5.8).

Multi-host: each process feeds its local shard via
``jax.make_array_from_process_local_data`` — the same helpers work for
single-host multi-chip and multi-host pods.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh.

    Works for pytrees (dicts of arrays). Under multi-host, arrays are
    assembled from per-process local shards.
    """
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (e.g. the train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def device_prefetch(iterator, mesh: Mesh, size: int = 2, axis_name: str = DATA_AXIS):
    """Stage host batches onto the device ``size`` steps ahead.

    With ~4 ms fused steps, the ~3 ms H2D copy of a KITTI batch would
    otherwise serialize with compute; prefetching overlaps transfer with the
    previous step's execution (jax dispatch is async, so device_put of the
    next batch proceeds while the current step runs).
    """
    import collections

    queue = collections.deque()

    def put(batch):
        n_valid = batch.pop("_n_valid", None)
        staged = shard_batch(batch, mesh, axis_name)
        return staged, n_valid

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
