"""Per-pass timing utilities.

The reference wraps every GPU pass in timestamp queries and smooths the
readback over a 30-sample rolling window (reference: src/timing.ts:1-20,
28-146, surfaced per-pass in the UI via pass.timingAverage, src/passes/
pass.ts:22-26).  The TPU equivalent: wall-clock a *jitted* per-pass program
bounded by a real device->host fetch, smoothed by the same rolling average.
`block_until_ready` is NOT a reliable sync on the relayed TPU platform
(measured, utils/devtime.py), so `fetch_sync` pulls one element of every
output to the host instead.  For deeper kernel profiles use
`jax.profiler.trace` around a render (see utils/devtime.device_time).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


def fetch_sync(x) -> None:
    """Force true device completion of every array in pytree `x` by fetching
    a single element to the host (the only trustworthy sync on this
    platform; see utils/devtime.py)."""
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


class RollingAverage:
    """30-sample ring-buffer mean (reference: src/timing.ts:1-20)."""

    def __init__(self, num_samples: int = 30) -> None:
        self._num_samples = num_samples
        self._samples: list[float] = []
        self._cursor = 0

    def add_sample(self, value: float) -> None:
        if len(self._samples) < self._num_samples:
            self._samples.append(value)
        else:
            self._samples[self._cursor] = value
        self._cursor = (self._cursor + 1) % self._num_samples

    @property
    def value(self) -> float:
        if not self._samples:
            return 0.0
        return sum(self._samples) / len(self._samples)


class PassTimer:
    """Times one named pass; `value` is the rolling mean in microseconds."""

    def __init__(self, name: str) -> None:
        self.name = name
        self.average = RollingAverage()

    @contextmanager
    def measure(self, result_to_block=None):
        start = time.perf_counter()
        yield
        if result_to_block is not None:
            try:
                fetch_sync(result_to_block)
            except Exception:
                pass
        self.average.add_sample((time.perf_counter() - start) * 1e6)

    def time_blocked(self, fn, *args, **kwargs):
        """Run fn, fetch-sync its output, record elapsed; returns the output."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        fetch_sync(out)
        self.average.add_sample((time.perf_counter() - start) * 1e6)
        return out

    def time_device(self, fn, *args, **kwargs):
        """Run fn under the profiler and record its on-device span (the TPU
        analogue of the reference's GPU timestamp queries, src/timing.ts:
        56-98): no relay round-trip lands in the recorded number, and it
        works for sharded programs where wall timing would fold in
        cross-device dispatch skew.  Falls back to `time_blocked` when the
        profiler yields no device events (e.g. pure-CPU test runs)."""
        from ..utils.devtime import device_time

        box = {}

        def run():
            box["out"] = fn(*args, **kwargs)
            return box["out"]

        dt = device_time(run)
        if dt.get("ok") and dt.get("total_s", 0.0) > 0:
            self.average.add_sample(dt["total_s"] * 1e6)
            return box["out"]
        return self.time_blocked(fn, *args, **kwargs)

    @property
    def value(self) -> float:
        return self.average.value
