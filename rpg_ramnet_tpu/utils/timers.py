"""Profiling timers.

Capability reference: RAM_Net/utils/timers.py (Timer:29 / CudaTimer:10
context managers accumulating per-name lists in module globals, printed at
exit via atexit).

TPU equivalent: `Timer` (wall clock), `DeviceTimer` (synchronizes the device
before/after the block — the CudaTimer analog), and a `profile_trace`
context manager wrapping jax.profiler for per-kernel timelines.
"""
from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

timers: Dict[str, List[float]] = defaultdict(list)


class Timer:
    """Wall-clock timer accumulating into the module-level `timers` dict."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.interval = time.perf_counter() - self.start
        timers[self.name].append(self.interval)
        return False


class DeviceTimer:
    """Synchronized device timer: waits for all in-flight device work before
    starting and for the block's outputs before stopping.  Pass the arrays
    produced inside the block to `sync()` (or rely on the exit barrier)."""

    def __init__(self, name: str):
        self.name = name
        self._outputs = None

    def sync(self, *arrays):
        self._outputs = arrays
        return arrays if len(arrays) != 1 else arrays[0]

    def __enter__(self):
        import jax
        (jax.device_put(0.0) + 0).block_until_ready()  # barrier
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import jax
        if self._outputs is not None:
            jax.block_until_ready(self._outputs)
        else:
            (jax.device_put(0.0) + 0).block_until_ready()
        self.interval = time.perf_counter() - self.start
        timers[self.name].append(self.interval)
        return False


@contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace capture (view in TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_timing_info():
    if not timers:
        return
    print("== Timing statistics ==")
    for name, values in timers.items():
        mean_ms = 1000.0 * sum(values) / len(values)
        print(f"{name}: {mean_ms:.2f} ms ({len(values)} samples)")


atexit.register(print_timing_info)
