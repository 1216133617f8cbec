"""Profiling hooks: jax.profiler traces + step timing.

The reference has no profiler integration — only wall-clock step/loader
timers (SURVEY.md §5 'Tracing / profiling'). Here both exist: the same
timers (utils.generic.StepTimer) plus on-demand XLA profiler traces
viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_server(port: int = 9999):
    """On-demand profiling server: connect with TensorBoard's capture tool."""
    return jax.profiler.start_server(port)


def memory_stats() -> Optional[dict]:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        s = getattr(d, "memory_stats", None)
        if callable(s):
            try:
                stats[str(d)] = d.memory_stats()
            except Exception:
                pass
    return stats or None
