"""Timing, progress reporting and profiling hooks (SURVEY.md §5).

The reference's observability surface is (a) per-unit-test wall timing
(test/src/saf_test.c:54-70) and (b) the init-progress API every example
exposes (``*_getProgressBar0_1`` / ``*_getProgressBarText``, e.g.
roombinauraliser.h:270-278, updated throughout initCodec).  Here:

* :class:`Timer` — wall-clock context with named laps.
* :class:`ProgressReporter` — thread-safe progress fraction + text, the
  analogue of the progressBar getters; ``design()`` functions accept one via
  an optional ``progress=`` callback-style argument where long-running.
* :func:`trace_annotation` — wraps ``jax.profiler`` trace annotations when a
  profiler is available (no-op otherwise), for device-side profiling.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, List, Optional, Tuple


class Timer:
    """Wall-clock timer with named laps (saf_test.c RUN_TEST timing)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._laps: List[Tuple[str, float]] = []

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - (self._t0 + sum(d for _, d in self._laps))
        self._laps.append((name, dt))
        return dt

    @property
    def total(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def laps(self) -> Dict[str, float]:
        return dict(self._laps)

    def report(self) -> str:
        lines = [f"  {n}: {1e3 * d:.2f} ms" for n, d in self._laps]
        return "\n".join(lines + [f"  total: {1e3 * self.total:.2f} ms"])


class ProgressReporter:
    """Progress fraction + text, readable from another thread
    (``*_getProgressBar0_1`` / ``*_getProgressBarText``)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._value = 0.0
        self._text = ""

    def set(self, value: float, text: Optional[str] = None):
        with self._lock:
            self._value = float(min(max(value, 0.0), 1.0))
            if text is not None:
                self._text = text

    @property
    def progress_0_1(self) -> float:
        with self._lock:
            return self._value

    @property
    def text(self) -> str:
        with self._lock:
            return self._text

    def done(self):
        self.set(1.0, "done")


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation when available, else a no-op — safe to
    leave in production code paths.  Only the import/constructor is
    guarded: wrapping the yield in the except would catch exceptions raised
    by the WITH-BODY and re-yield, destroying the user's traceback
    ("generator didn't stop after throw()")."""
    try:
        import jax.profiler as _prof

        ann = _prof.TraceAnnotation(name)
    except Exception:
        yield
        return
    with ann:
        yield
