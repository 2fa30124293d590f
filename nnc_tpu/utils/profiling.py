"""Structured profiling: jax.profiler traces + stage timers.

TPU-native replacement for the reference's ad-hoc `timeit` prints
(reference: nnc/compression.py:384-555). Usage::

    with trace_if("/tmp/nnc_trace", enabled=args.profile):
        run_pipeline()

Traces open in XProf/TensorBoard.
"""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Simple rays/sec (or items/sec) meter over a window."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int):
        self.items += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.items = 0
