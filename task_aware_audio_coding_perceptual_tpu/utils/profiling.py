"""Profiling/tracing utilities (SURVEY §5: the reference has essentially no
tracing beyond one RTF hook; the build makes ``jax.profiler`` first-class).

Usage:
    with profiling.trace("/tmp/jax-trace"):
        train_step(state, batch)   # view in xprof/tensorboard

    with profiling.annotate("encoder"):
        z = encode(...)            # named range inside a trace
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for everything inside the block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)
