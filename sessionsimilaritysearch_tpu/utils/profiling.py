"""Profiling helpers.

The reference's instrumentation is ad-hoc ``time.perf_counter`` brackets
around data loading and index search (SURVEY.md §5). Here: named phase
timers that force device completion before stopping the clock (JAX dispatch
is async -- a timer that doesn't synchronize measures nothing), and
``jax.profiler`` trace annotations for TensorBoard-able device profiles.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named phase timers.

    >>> timer = PhaseTimer()
    >>> with timer("embed"): emb = encode(batch)
    >>> timer.summary()
    """

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result is not None:
                jax.block_until_ready(result)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kw):
        """Run fn, block on its output, record the wall time."""
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in self.totals
        }


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler trace annotation (shows up in device traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_profile(log_dir: str):
    """Capture a device profile for TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
