"""Grain-backed loader (data/grain_loader.py, MUNIT_LOADER=grain): same
batch contract as the threaded loader, deterministic given seed, exact
mid-stream resume via grain iterator state."""

import os

import numpy as np
import pytest

pytest.importorskip("grain")

from PIL import Image

from munit_tpu.data import api
from munit_tpu.data.datasets import ImageFilelist
from munit_tpu.data.grain_loader import GrainDataLoader


@pytest.fixture(scope="module")
def filelist(tmp_path_factory):
    d = tmp_path_factory.mktemp("grain_imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(10):
        p = d / f"{i}.png"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    lst = d / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def _dataset(filelist):
    return ImageFilelist("/", filelist, new_size=32, height=32, width=32,
                         train=True)


def test_batch_contract_and_determinism(filelist):
    ds = _dataset(filelist)
    def take(n, **kw):
        dl = GrainDataLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                             seed=7, **kw)
        it = iter(dl)
        return [next(it) for _ in range(n)]

    a = take(5)
    b = take(5)
    for ba, bb in zip(a, b):
        assert set(ba.keys()) == set(bb.keys())
        for k in ba:
            assert ba[k].shape[0] == 4
            np.testing.assert_array_equal(ba[k], bb[k])
    # different seed → different stream
    c = GrainDataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=8)
    first = next(iter(c))
    k = sorted(first.keys())[0]
    assert not all(np.array_equal(x[k], first[k]) for x in a[:1])


def test_len_and_sharding(filelist):
    ds = _dataset(filelist)
    dl = GrainDataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                         seed=0, shard_index=0, shard_count=2)
    assert len(dl) == len(ds) // 2 // 2
    # two shards see disjoint records each epoch
    d0 = GrainDataLoader(ds, batch_size=5, shuffle=False, num_workers=0,
                         seed=0, shard_index=0, shard_count=2)
    d1 = GrainDataLoader(ds, batch_size=5, shuffle=False, num_workers=0,
                         seed=0, shard_index=1, shard_count=2)
    b0 = next(iter(d0))
    b1 = next(iter(d1))
    k = sorted(b0.keys())[0]
    flat0 = {b0[k][i].tobytes() for i in range(5)}
    flat1 = {b1[k][i].tobytes() for i in range(5)}
    assert not flat0 & flat1


def test_mid_stream_resume(filelist):
    ds = _dataset(filelist)
    dl = GrainDataLoader(ds, batch_size=3, shuffle=True, num_workers=0, seed=3)
    it = iter(dl)
    next(it); next(it)
    state = dl.state_dict()
    want = [next(it) for _ in range(3)]

    dl2 = GrainDataLoader(ds, batch_size=3, shuffle=True, num_workers=0, seed=3)
    iter(dl2) and None  # build the iterator
    it2 = iter(dl2)
    dl2.load_state_dict(state)
    got = [next(it2) for _ in range(3)]
    for wa, ga in zip(want, got):
        for k in wa:
            np.testing.assert_array_equal(wa[k], ga[k])


def test_api_selector(filelist, monkeypatch):
    monkeypatch.setenv("MUNIT_LOADER", "grain")
    monkeypatch.setenv("MUNIT_GRAIN_WORKERS", "0")
    dl = api.get_data_loader_list("/", filelist, batch_size=2, train=True,
                                  new_size=32, height=32, width=32,
                                  num_workers=0)
    assert isinstance(dl, GrainDataLoader)
    batch = next(iter(dl))
    k = sorted(batch.keys())[0]
    assert batch[k].shape[0] == 2
    monkeypatch.setenv("MUNIT_LOADER", "threads")
    dl2 = api.get_data_loader_list("/", filelist, batch_size=2, train=True,
                                   new_size=32, height=32, width=32,
                                   num_workers=0)
    assert not isinstance(dl2, GrainDataLoader)


def test_process_workers(filelist):
    """worker_count>0 spawns real grain processes — validates the dataset,
    transforms and source all pickle into workers."""
    ds = _dataset(filelist)
    dl = GrainDataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                         seed=11)
    it = iter(dl)
    batches = [next(it) for _ in range(3)]
    for b in batches:
        k = sorted(b.keys())[0]
        assert b[k].shape[0] == 2
    # deterministic across runs at the same worker count (grain batches
    # per worker, so composition differs from worker_count=0 — that is
    # expected and documented in grain_loader.py)
    dl2 = GrainDataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                          seed=11)
    it2 = iter(dl2)
    for b in batches:
        b2 = next(it2)
        for k in b:
            np.testing.assert_array_equal(b[k], b2[k])
