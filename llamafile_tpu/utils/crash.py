"""Crash reports + device-fault resilience.

Reference parity (SURVEY.md §5): ShowCrashReports() backtraces at every main
(llamafile/crash.{c,h}) and the failure-detection analog for TPU serving —
transient device faults (preemption, tunnel resets, FAILED_PRECONDITION) are
caught at the request boundary and retried on a fresh computation, which is
the single-host seed of "slice restart with request re-queue".
"""
from __future__ import annotations

import faulthandler
import functools
import sys
import time
from typing import Callable, Tuple, Type


def show_crash_reports() -> None:
    """Dump Python tracebacks on hard faults (SIGSEGV/SIGABRT) and on demand
    (SIGUSR1), like the reference's ShowCrashReports."""
    faulthandler.enable(file=sys.stderr, all_threads=True)
    try:
        import signal
        faulthandler.register(signal.SIGUSR1, file=sys.stderr, all_threads=True)
    except (ImportError, AttributeError, ValueError):
        pass


def _is_device_fault(e: BaseException) -> bool:
    name = type(e).__name__
    msg = str(e)
    return ("JaxRuntimeError" in name or "XlaRuntimeError" in name) and any(
        s in msg for s in ("FAILED_PRECONDITION", "UNAVAILABLE", "INTERNAL",
                           "ABORTED", "DATA_LOSS"))


def device_retry(retries: int = 2, backoff_s: float = 2.0):
    """Decorator: retry a device-executing function across transient faults.

    Only retries errors that look like device/runtime failures (halted core,
    lost tunnel); logic errors propagate immediately.
    """
    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last = None
            for attempt in range(retries + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:   # noqa: BLE001 — filtered below
                    if not _is_device_fault(e) or attempt == retries:
                        raise
                    last = e
                    print(f"device fault (attempt {attempt + 1}/{retries + 1}): "
                          f"{str(e)[:200]} — retrying in {backoff_s}s",
                          file=sys.stderr)
                    time.sleep(backoff_s * (attempt + 1))
            raise last  # pragma: no cover
        return wrapper
    return deco
