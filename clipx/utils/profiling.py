"""Tracing / profiling utilities (SURVEY.md section 5).

The reference's only instrumentation is one wall-clock print around
``index.search`` (reference:query-index.py:110-113). Here every pipeline
stage (decode, H2D+encode, writeback, index build) is timed and the
structured throughput counters (images/sec — the BASELINE.json metric)
are emitted on stderr so the reference's stdout contract stays
byte-compatible. ``device_trace`` wraps ``jax.profiler.trace`` for real
XLA profiles when a trace dir is requested.
"""

from __future__ import annotations

import contextlib
import sys
import time
from collections import OrderedDict
from typing import Iterator, Optional


class StageTimers:
    """Accumulates wall time and item counts per named stage."""

    def __init__(self) -> None:
        self._acc: "OrderedDict[str, float]" = OrderedDict()
        self._items: "OrderedDict[str, int]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0, items)

    def record(self, name: str, seconds: float, items: int = 0) -> None:
        self._acc[name] = self._acc.get(name, 0.0) + seconds
        self._items[name] = self._items.get(name, 0) + items

    def seconds(self, name: str) -> float:
        return self._acc.get(name, 0.0)

    def items(self, name: str) -> int:
        return self._items.get(name, 0)

    def summary(self) -> str:
        rows = []
        for name, secs in self._acc.items():
            n = self._items.get(name, 0)
            rate = f" ({n / secs:,.1f}/s)" if n and secs > 0 else ""
            count = f" n={n}" if n else ""
            rows.append(f"{name}: {secs:.3f}s{count}{rate}")
        return "; ".join(rows)

    def emit(self, prefix: str = "[stats] ") -> None:
        if self._acc:
            print(prefix + self.summary(), file=sys.stderr, flush=True)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
