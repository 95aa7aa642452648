"""Per-stage timing — the observability layer the reference lacks.

The reference only wall-clocks whole batches (segmenter.py:309-335).  Here
every pipeline stage (decode / features / segment) is timed, accumulated and
queryable, and `jax.profiler` trace capture can wrap any region.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class StageTimers:
    def __init__(self, *stages):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        # batch_process times decode/features on concurrent producer
        # threads; the += accumulation must not lose updates
        self._lock = threading.Lock()
        for s in stages:
            self.totals[s] = 0.0
            self.counts[s] = 0

    @contextlib.contextmanager
    def time(self, stage):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[stage] += dt
                self.counts[stage] += 1

    def summary(self):
        return {s: dict(total_s=self.totals[s], calls=self.counts[s])
                for s in self.totals}

    def reset(self):
        for s in list(self.totals):
            self.totals[s] = 0.0
            self.counts[s] = 0


@contextlib.contextmanager
def jax_trace(logdir):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
