"""Profiling hooks (the reference has none; GStreamer debug logging was its
only observability, src/runtest-1.0.sh:7 — here we expose the JAX profiler).

Usage:
    with profiling.trace("/tmp/peaq-trace"):
        api.peaq(ref, test)
    # then: tensorboard --logdir /tmp/peaq-trace   (or xprof)
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    """Wall-clock a block (host-side; device work must be synchronized by
    the caller, e.g. via np.asarray on outputs)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {(time.perf_counter() - t0) * 1000:.1f} ms")
