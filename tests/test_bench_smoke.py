"""Smoke-execute the driver-facing artifacts: bench.py and __graft_entry__.

bench.py is the ONE artifact the round driver runs on real hardware to record
the headline number; an import error or API drift there costs an entire
round's benchmark capture. This executes the whole script end-to-end on CPU
at BENCH_TINY shapes (same code path: fused dis+gen cadence, classifier_sr
update, JSON emission) so any trainer-API breakage fails here first.
"""

import importlib
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BATCH", "1")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_CROP", "64")
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BF16", "0")
    monkeypatch.setenv("BENCH_ACT_BF16", "0")
    monkeypatch.syspath_prepend(REPO)
    import bench
    importlib.reload(bench)   # re-read the env-derived module constants
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "munit_256_train_images_per_sec_per_chip"
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    # vs_baseline is round(value/20, 3) — compare at the rounding granularity
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 20.0, abs=6e-4)


def test_graft_entry_single_chip():
    """entry() must return a jittable (fn, args) pair; trace it abstractly
    (no full 256² CPU execution) to verify the closure really compiles."""
    monkey_path = REPO not in sys.path
    if monkey_path:
        sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
        import jax
        fn, args = ge.entry()
        shapes = jax.eval_shape(fn, *args)
        assert shapes.shape == (1, 256, 256, 3)
    finally:
        if monkey_path:
            sys.path.remove(REPO)


def test_bench_smoke_mesh(monkeypatch, capsys):
    """BENCH_MESH=auto: the same bench data-parallels over the fake 8-device
    mesh (replicated state, sharded batch) and still emits the per-chip JSON
    line — validating the multi-chip bench path without TPUs."""
    monkeypatch.setenv("BENCH_BATCH", "1")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_CROP", "64")
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BF16", "0")
    monkeypatch.setenv("BENCH_ACT_BF16", "0")
    monkeypatch.setenv("BENCH_MESH", "auto")
    monkeypatch.syspath_prepend(REPO)
    import jax
    assert jax.device_count() == 8   # conftest's fake mesh
    import bench
    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
