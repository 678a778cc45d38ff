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
