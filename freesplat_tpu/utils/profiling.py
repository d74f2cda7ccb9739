"""Trace-level profiling helpers (SURVEY §5: jax.profiler traces + the
rays/s counter; the reference has only a wall-clock Benchmarker,
``misc/benchmarker.py:16-48``).

``trace(dir)`` wraps ``jax.profiler.trace`` for TensorBoard-viewable
device traces.  On some remote-compilation backends (e.g. the tunneled
single-chip dev setup) ``start_trace`` hangs; set FREESPLAT_NO_TRACE=1
(or pass enabled=False) to turn the context into a no-op rather than
littering call sites with try/except.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator


def trace_enabled() -> bool:
    return os.environ.get("FREESPLAT_NO_TRACE", "0") != "1"


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool | None = None) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (TensorBoard 'profile'
    plugin format).  No-op when disabled."""
    if enabled is None:
        enabled = trace_enabled()
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
