"""Running-average and timing meters.

Replaces utils/average_meter.py, time_meter.py and torch_time_meter.py.
Device-section timing on TPU goes through `jax.profiler` traces (XLA fuses
whole steps, so per-section CUDA-event timing has no analogue); `TimeMeter` +
`section` cover host-side wall-clock instrumentation.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class AverageMeter:
    """Keyed running means, poppable per logging interval
    (utils/average_meter.py)."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def add(self, values: Dict[str, float]):
        for key, value in values.items():
            self._sums[key] += float(value)
            self._counts[key] += 1

    def mean(self, key: str) -> float:
        return self._sums[key] / max(self._counts[key], 1)

    def pop_all(self) -> Dict[str, float]:
        out = {k: self.mean(k) for k in self._sums}
        self._sums.clear()
        self._counts.clear()
        return out


class TimeMeter:
    """Named wall-clock section timing with mean/sum summaries
    (utils/time_meter.py + torch_time_meter.py's reporting surface)."""

    def __init__(self, mode: str = "mean", enabled: bool = True):
        self.mode = mode
        self.enabled = enabled
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._starts: Dict[str, float] = {}

    def start(self, name: str):
        if self.enabled:
            self._starts[name] = time.perf_counter()

    def end(self, name: str):
        if self.enabled and name in self._starts:
            self._totals[name] += time.perf_counter() - self._starts.pop(name)
            self._counts[name] += 1

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def summary(self) -> Dict[str, float]:
        if self.mode == "sum":
            return dict(self._totals)
        return {k: v / max(self._counts[k], 1) for k, v in self._totals.items()}

    def print_summary(self):
        for name, value in sorted(self.summary().items()):
            print(f"[time] {name}: {value * 1000:.1f} ms")


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace around a region (the TPU equivalent of the
    reference's torch.profiler epoch wrap, training/trainer.py:607-618)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
