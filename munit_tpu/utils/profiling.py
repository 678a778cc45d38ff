"""Profiling: jax.profiler trace capture (SURVEY.md §5.1 — the reference had
only a wall-clock Timer + per-step cuda.synchronize; TPU-native equivalent is
a trace the XProf/TensorBoard profiler can open)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/munit_tpu_trace"):
    """Capture a profiler trace around a code block:

        with profiling.trace("runs/trace"):
            trainer.dis_update(...)
    """
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def start_trace(logdir: str):
    """Imperative start (for window captures inside the train loop)."""
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)


def stop_trace():
    import jax
    jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for step-level attribution."""
    import jax
    return jax.profiler.TraceAnnotation(name)
