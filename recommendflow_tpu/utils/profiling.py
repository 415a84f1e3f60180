"""Tracing / profiling: first-class per-step timing + device traces.

The reference scatters ad-hoc time.time() prints through hot paths
(SURVEY §5: faiss_searcher.py:144-193, eval_utils.py:103-146, ...). Here:
  * `StepTimer` — EMA step-time / examples-per-sec tracker the trainer
    reports every epoch,
  * `trace(logdir)` — context manager around jax.profiler for device
    traces viewable in TensorBoard/Perfetto,
  * `timed(name)` — lightweight scope timer collecting into a global
    registry, printable as a table.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

_SCOPES: Dict[str, list] = defaultdict(list)


class StepTimer:
    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.avg_ms: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) * 1000
            self.avg_ms = dt if self.avg_ms is None else \
                self.ema * self.avg_ms + (1 - self.ema) * dt
        self._last = now
        return self.avg_ms

    def examples_per_sec(self, batch_size: int) -> Optional[float]:
        if not self.avg_ms:
            return None
        return batch_size / (self.avg_ms / 1000)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Device trace via jax.profiler (TensorBoard 'profile' plugin /
    Perfetto). Wrap a handful of steady-state steps, not the whole run."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _SCOPES[name].append(time.perf_counter() - t0)


def scope_report(reset: bool = True) -> str:
    from recommendflow_tpu.utils.tables import format_table
    rows = []
    for name, times in sorted(_SCOPES.items()):
        total = sum(times)
        rows.append([name, len(times), f"{total*1000:.1f}",
                     f"{total/len(times)*1000:.2f}"])
    if reset:
        _SCOPES.clear()
    return format_table(rows, headers=["scope", "calls", "total_ms", "avg_ms"],
                        title="Timing scopes")


def memory_percent() -> float:
    """Host memory usage fraction (parity: utils/util.py:328-329
    men_percentage gauge), from /proc/meminfo — no psutil dependency."""
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            parts = line.split()
            info[parts[0].rstrip(":")] = int(parts[1])
    total = info.get("MemTotal", 1)
    avail = info.get("MemAvailable", info.get("MemFree", 0))
    return 100.0 * (1.0 - avail / total)
