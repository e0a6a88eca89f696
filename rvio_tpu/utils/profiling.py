"""Profiling instrumentation.

The reference records two wall-clock numbers per frame into time_cost.dat
(reference: System.cc:253-260, 376-379); the drivers here do the same.  For
kernel-level analysis this module wraps jax.profiler traces (viewable in
TensorBoard / Perfetto) and provides a simple wall-clock stage timer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace around a code block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock stage timer (host-side, blocking)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        import jax
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            ms = self.totals[name] * 1e3
            lines.append(f"{name:28s} {ms:10.2f} ms total "
                         f"{ms / max(n, 1):8.3f} ms/call x{n}")
        return "\n".join(lines)
