"""Profiler trace capture smoke (utils/profiling — SURVEY.md §5.1)."""

import glob
import os

import jax.numpy as jnp

from munit_tpu.utils import profiling


def test_trace_capture(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        with profiling.annotate("toy_op"):
            x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
            float(x[0, 0])
    # xplane artifacts written
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any("xplane" in f or f.endswith(".trace.json.gz") for f in files), files
