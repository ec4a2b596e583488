"""Running-average meters and a lightweight terminal logger.

Reference behavior: /root/reference/logger.py — a multi-valued AverageMeter
and fixed-position progress bars. The TPU build uses tqdm-style single-line
progress (blessings/progressbar2 are not needed) and keeps the meter API.
"""

from __future__ import annotations

import sys
import time
from typing import List, Sequence, Union


class AverageMeter:
    """Tracks ``i`` simultaneous values (reference: logger.py:66-93)."""

    def __init__(self, i: int = 1, precision: int = 3):
        self.meters = i
        self.precision = precision
        self.reset()

    def reset(self) -> None:
        self.val = [0.0] * self.meters
        self.avg = [0.0] * self.meters
        self.sum = [0.0] * self.meters
        self.count = 0

    def update(self, val: Union[float, Sequence[float]], n: int = 1) -> None:
        if not isinstance(val, (list, tuple)):
            val = [val]
        assert len(val) == self.meters
        self.count += n
        self.val = [float(v) for v in val]
        self.sum = [s + v * n for s, v in zip(self.sum, self.val)]
        self.avg = [s / self.count for s in self.sum]

    def __repr__(self) -> str:
        val = " ".join(f"{v:.{self.precision}f}" for v in self.val)
        avg = " ".join(f"{a:.{self.precision}f}" for a in self.avg)
        return f"{val} ({avg})"


class ProgressLogger:
    """Minimal epoch/train/valid progress printer."""

    def __init__(self, n_epochs: int, train_size: int, valid_size: int):
        self.n_epochs = n_epochs
        self.train_size = train_size
        self.valid_size = valid_size
        self.epoch = 0
        self._t0 = time.time()

    def start_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        print(f"=> epoch {epoch + 1}/{self.n_epochs}", flush=True)

    def train_update(self, i: int, msg: str = "") -> None:
        self._line("train", i, self.train_size, msg)

    def valid_update(self, i: int, msg: str = "") -> None:
        self._line("valid", i, self.valid_size, msg)

    def _line(self, phase: str, i: int, total: int, msg: str) -> None:
        el = time.time() - self._t0
        sys.stdout.write(f"\r[{phase} {i}/{total}] {el:7.1f}s {msg}   ")
        if i >= total:
            sys.stdout.write("\n")
        sys.stdout.flush()

    def write(self, msg: str) -> None:
        print(msg, flush=True)
