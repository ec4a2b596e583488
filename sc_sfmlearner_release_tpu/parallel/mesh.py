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
SPATIAL_AXIS = "spatial"

# Image-width axis per batch key, for spatial sharding. The reference has no
# model-parallel axis at all (SURVEY.md §5.7); here the W axis of every
# image-like array can shard over a second mesh axis and XLA's SPMD
# partitioner inserts the conv halo exchanges automatically.
_W_AXIS_BY_KEY = {"tgt": 2, "refs": 3, "img": 2, "depth": 2}


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    spatial: int,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = DATA_AXIS,
    spatial_axis: str = SPATIAL_AXIS,
) -> Mesh:
    """2-D (data x spatial) mesh: batch shards over ``data``, image width
    over ``spatial``. ``spatial`` must divide the device count; adjacent
    devices share an image so the halo exchange rides the shortest ICI hops.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"spatial={spatial} must divide device count {n}")
    return Mesh(
        np.asarray(devices).reshape(n // spatial, spatial),
        (data_axis, spatial_axis),
    )


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def _spec_for(key: str, ndim: int, mesh: Mesh, axis_name: str, offset: int = 0):
    """PartitionSpec for one batch entry: batch axis over ``data``, and —
    when the mesh has a non-trivial spatial axis — image width over
    ``spatial`` for the known image-like keys. ``offset=1`` handles stacked
    fused-step batches ([K, B, ...]): the leading scan axis is replicated
    and every other axis shifts right by one."""
    # Scalars (e.g. the trailing-batch "n_valid" count) replicate.
    parts = ([None] * offset + [axis_name] + [None] * (ndim - 1 - offset))[:ndim]
    if (
        SPATIAL_AXIS in mesh.axis_names
        and mesh.shape[SPATIAL_AXIS] > 1
        and key in _W_AXIS_BY_KEY
        and _W_AXIS_BY_KEY[key] + offset < ndim
    ):
        parts[_W_AXIS_BY_KEY[key] + offset] = SPATIAL_AXIS
    return P(*parts)


# Per-transfer staging chunk: host arrays larger than this are staged as
# several smaller device_puts along the leading (fused-steps) axis and
# reassembled on-device. The XLA:TPU runtime kernel-faults when a single
# staged fused-steps input transfer reaches ~368 MB (docs/DESIGN.md §1);
# bounding each TRANSFER under the verified-good envelope lifts the
# b16 x fused-12/16 configs that the round-3 fence rejected.
STAGE_CHUNK_BYTES = 128 * 1024 * 1024

# jitted on-device reassembly, cached per (shape, dtype, sharding)
_concat_cache: dict = {}


def _chunked_device_put(x: np.ndarray, sharding: NamedSharding):
    """device_put ``x`` as ceil(nbytes / STAGE_CHUNK_BYTES) separate
    leading-axis slices, then concatenate on-device with the target
    sharding. Each H2D transfer stays under the chunk size; the transient
    cost is one extra on-device copy of ``x``."""
    import math

    import jax.numpy as jnp

    n_chunks = min(int(math.ceil(x.nbytes / STAGE_CHUNK_BYTES)), x.shape[0])
    per = int(math.ceil(x.shape[0] / n_chunks))
    bounds = [(i * per, min((i + 1) * per, x.shape[0]))
              for i in range(n_chunks)]
    bounds = [b for b in bounds if b[1] > b[0]]
    parts = [jax.device_put(np.ascontiguousarray(x[lo:hi]), sharding)
             for lo, hi in bounds]
    key = (tuple(p.shape for p in parts), x.dtype.str, sharding)
    fn = _concat_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda *xs: jnp.concatenate(xs, axis=0), out_shardings=sharding
        )
        _concat_cache[key] = fn
    return fn(*parts)


def shard_batch(
    batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS, stacked: bool = False
) -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh.

    Works for pytrees (dicts of arrays). On a 2-D (data x spatial) mesh,
    image-like entries additionally shard their width axis. Under
    multi-host, arrays are assembled from per-process local shards.
    ``stacked=True``: batches carry a leading fused-steps axis ([K, B, ...],
    see training.make_train_step) — the scan axis replicates, the batch
    axis is axis 1, and large arrays are staged as multiple bounded
    transfers (see ``STAGE_CHUNK_BYTES``).
    """
    offset = 1 if stacked else 0

    def put(key, x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, _spec_for(key, x.ndim, mesh, axis_name, offset)
        )
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        if stacked and x.nbytes > STAGE_CHUNK_BYTES and x.shape[0] > 1:
            return _chunked_device_put(x, sharding)
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        # Recurse per top-level key so nested containers (lists/dicts of
        # arrays) still shard leaf-wise, while the key-aware spatial spec
        # applies to every leaf under that key.
        return {
            k: jax.tree_util.tree_map(lambda x, k=k: put(k, x), v)
            for k, v in batch.items()
        }
    return jax.tree_util.tree_map(lambda x: put("", x), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (e.g. the train state) across the mesh.

    Multi-process: assembled from each process's local copy via
    ``make_array_from_process_local_data`` — ``jax.device_put`` onto a
    cross-process sharding would run a value-equality collective
    (multihost_utils.assert_equal) over the full tree, which both wastes a
    full allgather of the parameters at startup and is the first Gloo/ICI
    rendezvous, prone to coordination timeouts when processes start
    skewed. Callers guarantee same-value state on every process (seeded
    init / checkpoint restore), matching standard pod practice.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def device_prefetch(
    iterator, mesh: Mesh, size: int = 2, axis_name: str = DATA_AXIS,
    stacked: bool = False,
):
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
        staged = shard_batch(batch, mesh, axis_name, stacked=stacked)
        return staged, n_valid

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
