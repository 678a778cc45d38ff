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
