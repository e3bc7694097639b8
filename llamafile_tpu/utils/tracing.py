"""Tracing / profiling / numeric-trap debugging.

Reference parity (SURVEY.md §5):
- `--trace` (llamafile/trace.c:28-70: per-op Chrome trace ring) -> jax.profiler
  traces viewable in Perfetto/TensorBoard, plus a lightweight host-side span
  recorder emitting the same Chrome about://tracing JSON format.
- `--trap` (llamafile/debug.cpp:33: FP-exception trapping around graph eval)
  -> jax debug_nans/debug_infs.
"""
from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager
from typing import List, Optional


class ChromeTracer:
    """Host-side span recorder writing Chrome about://tracing JSON
    (same consumer UX as the reference's --trace output)."""

    def __init__(self, path: str, ring: int = 1_000_000):
        self.path = path
        self.events: List[dict] = []
        self.lock = threading.Lock()
        self.ring = ring
        self.t0 = time.perf_counter_ns()

    @contextmanager
    def span(self, name: str, cat: str = "op"):
        start = (time.perf_counter_ns() - self.t0) / 1e3
        try:
            yield
        finally:
            dur = (time.perf_counter_ns() - self.t0) / 1e3 - start
            with self.lock:
                if len(self.events) < self.ring:
                    self.events.append({
                        "name": name, "cat": cat, "ph": "X", "ts": start,
                        "dur": dur, "pid": os.getpid(),
                        "tid": threading.get_ident() % 1_000_000,
                    })

    def write(self) -> None:
        with open(self.path, "w") as f:
            json.dump({"traceEvents": self.events}, f)


_tracer: Optional[ChromeTracer] = None


def enable_tracing(path: str) -> ChromeTracer:
    global _tracer
    _tracer = ChromeTracer(path)
    return _tracer


def tracer() -> Optional[ChromeTracer]:
    return _tracer


@contextmanager
def span(name: str, cat: str = "op"):
    t = _tracer
    if t is None:
        yield
    else:
        with t.span(name, cat):
            yield


def start_device_trace(logdir: str) -> None:
    """XLA-level trace (jax.profiler): op-by-op device timeline."""
    import jax
    jax.profiler.start_trace(logdir)


def stop_device_trace() -> None:
    import jax
    jax.profiler.stop_trace()


def enable_trap() -> None:
    """NaN/Inf trapping on every jit output (reference --trap analog:
    prints the offending computation instead of silent propagation)."""
    import jax
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
