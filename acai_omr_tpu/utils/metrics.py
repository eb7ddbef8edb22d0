"""Training observability: TensorBoard scalars + CSV stats + step timing.

The reference logs per-optim-step scalars to TensorBoard and per-epoch CSVs
(reference: omr_teacher_force_train.py:132-137, utils.py:242-305). Same
surface here, plus wall-clock step timing (the reference only times epochs)
and an optional jax profiler trace hook.
"""

from __future__ import annotations

import contextlib
import csv
import time
from pathlib import Path


class MetricsWriter:
    """TensorBoard (if available) + CSV scalar sink."""

    def __init__(self, log_dir: str | None = None, csv_path: str | None = None):
        self.tb = None
        if log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir, max_queue=50)
            except Exception:
                self.tb = None
        self.csv_path = Path(csv_path) if csv_path else None
        self._csv_rows = []

    def scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)
        if self.csv_path:
            # only buffer rows a CSV sink will drain: TB-only writers grew
            # this list for the life of the training process (round-4 review)
            self._csv_rows.append({"step": step, "tag": tag, "value": value})

    def scalars(self, prefix: str, values: dict, step: int) -> None:
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def flush(self) -> None:
        if self.tb is not None:
            self.tb.flush()
        if self.csv_path and self._csv_rows:
            self.csv_path.parent.mkdir(parents=True, exist_ok=True)
            exists = self.csv_path.exists()
            with open(self.csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["step", "tag", "value"])
                if not exists:
                    w.writeheader()
                w.writerows(self._csv_rows)
            self._csv_rows = []


class StepTimer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.count = 0

    def tick(self) -> float:
        t = time.perf_counter()
        dt = t - self.t0
        self.t0 = t
        self.count += 1
        return dt


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
