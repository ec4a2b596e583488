"""Host-side prefetching batch loader.

Replaces ``torch.utils.data.DataLoader(num_workers=4, pin_memory=True)``
(reference: /root/reference/train.py:142-147) with a thread-pool pipeline:
JPEG decode + augmentation release the GIL in C, so threads keep the TPU fed
without process overhead. Batches are fixed-shape NHWC numpy arrays ready
for ``parallel.shard_batch``; a background prefetch queue overlaps host IO
with device compute.

Determinism: worker randomness is keyed by (epoch seed, sample index), so a
run is reproducible for any worker count — stronger than the reference,
whose aug stream depends on worker scheduling.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class BatchLoader:
    """Iterable over fixed-shape batches of a dataset with ``load(i, rng)``.

    Args:
      dataset: object with ``__len__`` and ``load(index, rng) -> dict``.
      batch_size: global batch size (must divide evenly across devices).
      shuffle: reshuffle each epoch (seeded).
      num_workers: decode/augment thread count.
      drop_last: drop the trailing partial batch (training). When False, the
        final batch is padded by repeating the last sample and the true count
        is reported in ``batch["_n_valid"]`` (validation).
      seed: base seed; epoch ``e`` uses ``seed + e``.
      prefetch: number of batches to stage ahead.
      process_index / process_count: multi-host sharding — each process
        loads only its ``batch_size / process_count`` slice of every global
        batch (the slice ``jax.make_array_from_process_local_data`` expects).
        Pass ``jax.process_index()`` / ``jax.process_count()`` on pods.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if batch_size % process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{process_count} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        bs = self.batch_size
        n_batches = len(self)
        if n_batches == 0:
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_one(i: int) -> Dict[str, np.ndarray]:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed + self.epoch, int(i)])
            )
            return self.dataset.load(int(i), rng)

        local_bs = bs // self.process_count

        def producer() -> None:
            with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    chunk = indices[b * bs : (b + 1) * bs]
                    n_valid = len(chunk)
                    if n_valid < bs:  # pad the trailing validation batch
                        chunk = np.concatenate(
                            [chunk, np.repeat(chunk[-1:], bs - n_valid)]
                        )
                    # this process's contiguous slice of the global batch
                    chunk = chunk[
                        self.process_index * local_bs
                        : (self.process_index + 1) * local_bs
                    ]
                    samples = list(pool.map(load_one, chunk))
                    batch = {
                        k: np.stack([s[k] for s in samples]) for k in samples[0]
                    }
                    batch["_n_valid"] = np.asarray(n_valid, np.int32)
                    out_q.put(batch)
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit if we stopped early.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.1)
