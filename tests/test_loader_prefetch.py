"""device_prefetch: ordering, exhaustion, sharded placement."""

import numpy as np

import jax

from munit_tpu.data.loader import device_prefetch
from munit_tpu.dist import make_mesh, data_sharding


def batches(n):
    for i in range(n):
        yield {"x": np.full((8, 4), i, np.float32), "name": [f"b{i}"]}


def test_prefetch_preserves_order_and_count():
    out = list(device_prefetch(batches(5), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        assert b["name"] == [f"b{i}"]


def test_prefetch_sharded_placement():
    mesh = make_mesh()
    sh = data_sharding(mesh)
    out = list(device_prefetch(batches(3), size=2, sharding=sh))
    assert len(out) == 3
    x = out[0]["x"]
    assert x.sharding == sh
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_prefetch_multihost_assembly_path(monkeypatch):
    """SURVEY §5.8(d): when jax.process_count() > 1 the prefetcher must
    assemble per-host loader shards into GLOBAL arrays via
    make_global_array (plain device_put cannot). Forced on here
    (MUNIT_FORCE_GLOBAL_BATCH=1) in a single process, where the assembly
    must be exactly equivalent to device_put with the same sharding."""
    monkeypatch.setenv("MUNIT_FORCE_GLOBAL_BATCH", "1")
    mesh = make_mesh()
    sh = data_sharding(mesh)
    out = list(device_prefetch(batches(3), size=2, sharding=sh))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert b["x"].sharding == sh
        assert b["x"].shape == (8, 4)
        np.testing.assert_allclose(np.asarray(b["x"]), i)
        assert b["name"] == [f"b{i}"]   # non-arrays pass through


def test_make_global_batch_matches_device_put():
    from munit_tpu.dist.mesh import make_global_batch
    mesh = make_mesh()
    sh = data_sharding(mesh)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "m": np.ones((8, 2, 2, 1), np.float32)}
    g = make_global_batch(mesh, batch)
    for k in batch:
        assert g[k].sharding.is_equivalent_to(sh, batch[k].ndim)
        np.testing.assert_array_equal(np.asarray(g[k]), batch[k])


def test_loader_worker_exception_propagates():
    """A dataset error in the producer must raise in the consumer, not
    leave it blocked forever on the prefetch queue (the r2 FID-pipeline
    hang: np.stack of mixed-shape samples killed the producer thread
    silently and the main thread waited on out_q.get() indefinitely)."""
    import pytest
    from munit_tpu.data.loader import DataLoader

    class Exploding:
        def __len__(self):
            return 8

        def get(self, index, rng):
            if index >= 4:
                raise RuntimeError("boom at index %d" % index)
            return {"x": np.zeros((2, 2), np.float32)}

    dl = DataLoader(Exploding(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl.batches())


def test_loader_mixed_shapes_error_propagates():
    """Unstackable (mixed-shape) samples also surface as an error."""
    import pytest
    from munit_tpu.data.loader import DataLoader

    class Mixed:
        def __len__(self):
            return 4

        def get(self, index, rng):
            return {"x": np.zeros((2 + index % 2, 2), np.float32)}

    dl = DataLoader(Mixed(), batch_size=2, shuffle=False, num_workers=1)
    with pytest.raises(ValueError):
        list(dl.batches())
