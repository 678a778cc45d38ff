"""Data pipeline tests: transform parity vs torchvision semantics + loader
behavior (shuffling, sharding, joint mask transforms, synthetic 5-tuple)."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from munit_tpu.data import (
    DataLoader, ImageMaskDataset, SyntheticPairDataset, FidPairDataset,
    get_data_loader_list,
)
from munit_tpu.data import transforms as T


@pytest.fixture
def imgdir(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 255, (80, 100, 3), np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    flist = tmp_path / "list.txt"
    flist.write_text("\n".join(paths))
    return tmp_path, paths, str(flist)


def test_resize_shorter_semantics(imgdir):
    # torchvision Resize(int): shorter side → size, aspect preserved, BILINEAR
    _, paths, _ = imgdir
    img = Image.open(paths[0]).convert("RGB")  # 100x80 (w x h)
    out = T.resize_shorter(img, 64)
    assert out.size == (80, 64)  # shorter side (h=80) → 64, w scales 100*64/80
    want = np.asarray(img.resize((80, 64), Image.BILINEAR))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_to_tensor_normalize_parity(imgdir):
    # ToTensor (÷255) + Normalize(.5,.5,.5) == x*2-1 on [0,1]
    _, paths, _ = imgdir
    img = Image.open(paths[0]).convert("RGB")
    raw = np.asarray(img).astype(np.float32) / 255.0
    want = raw * 2.0 - 1.0
    got = T.normalize_pm1(T.to_array01(img))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_list_loader_shapes_and_range(imgdir, monkeypatch):
    _, _, flist = imgdir
    # default (r4): uint8 batches, normalized on device by device_prefetch
    loader = get_data_loader_list("", flist, batch_size=2, train=True,
                                  new_size=64, height=48, width=48,
                                  num_workers=2)
    batch = next(iter(loader))
    x = batch["image"]
    assert x.shape == (2, 48, 48, 3)
    assert x.dtype == np.uint8
    # MUNIT_LOADER_UINT8=0: host-side f32 [-1,1] (the pre-r4 default)
    monkeypatch.setenv("MUNIT_LOADER_UINT8", "0")
    loader = get_data_loader_list("", flist, batch_size=2, train=True,
                                  new_size=64, height=48, width=48,
                                  num_workers=2)
    x = next(iter(loader))["image"]
    assert x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_loader_epoch_determinism_and_sharding(imgdir):
    _, _, flist = imgdir
    mk = lambda shard, count: get_data_loader_list(
        "", flist, 1, True, 64, 48, 48, 1, seed=7,
        shard_index=shard, shard_count=count)
    full = [b["image"] for _, b in zip(range(6), iter(mk(0, 1)))]
    full2 = [b["image"] for _, b in zip(range(6), iter(mk(0, 1)))]
    np.testing.assert_allclose(full[0], full2[0])  # same seed → same stream
    # 2-way sharding: shards are disjoint slices of the same permutation
    s0 = [b["image"] for _, b in zip(range(3), iter(mk(0, 2)))]
    s1 = [b["image"] for _, b in zip(range(3), iter(mk(1, 2)))]
    stack = np.concatenate(s0 + s1)
    assert len(np.unique(stack.round(4).reshape(6, -1), axis=0)) == 6


def test_image_mask_joint_transform(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (90, 90, 3), np.uint8)
    # mask stored as {0,255}; right half masked
    mask = np.zeros((90, 90), np.uint8)
    mask[:, 45:] = 255
    ip, mp = tmp_path / "i.png", tmp_path / "m.png"
    Image.fromarray(img).save(ip)
    Image.fromarray(mask).save(mp)
    (tmp_path / "il.txt").write_text(str(ip))
    (tmp_path / "ml.txt").write_text(str(mp))

    ds = ImageMaskDataset(str(tmp_path / "il.txt"), str(tmp_path / "ml.txt"),
                          new_size=64, height=32, width=32)
    out = ds.get(0, np.random.default_rng(3))
    assert out["image"].shape == (32, 32, 3)
    assert out["mask"].shape == (32, 32, 1)
    assert set(np.unique(out["mask"])) <= {0.0, 1.0}


def test_synthetic_5tuple(tmp_path):
    rng = np.random.RandomState(2)
    base = rng.randint(0, 255, (70, 70, 3), np.uint8)
    flooded = base.copy()
    flooded[40:, :] = 30  # differs only in the bottom region (the "water")
    mask = np.zeros((70, 70), np.uint8)
    mask[40:, :] = 1      # {0,1}-style mask
    sem_vals = np.asarray([0, 29, 55, 76, 133, 149, 178, 200, 255], np.uint8)
    sem = sem_vals[rng.randint(0, 9, (70, 70))]

    names = {}
    for name, arr in [("a", base), ("b", flooded)]:
        p = tmp_path / f"{name}.png"
        Image.fromarray(arr).save(p)
        names[name] = str(p)
    for name, arr in [("m", mask), ("sa", sem), ("sb", sem)]:
        p = tmp_path / f"{name}.png"
        Image.fromarray(arr).save(p)
        names[name] = str(p)
    for k, v in names.items():
        (tmp_path / f"{k}.txt").write_text(v)

    ds = SyntheticPairDataset(
        *[str(tmp_path / f"{k}.txt") for k in ("a", "b", "m", "sa", "sb")],
        new_size=64, height=48, width=48)
    out = ds.get(0, np.random.default_rng(4))
    assert out["image_a"].shape == (48, 48, 3)
    assert out["image_b"].shape == (48, 48, 3)
    assert out["mask"].shape == (48, 48, 1)
    assert set(np.unique(out["mask"])) <= {0.0, 1.0}
    assert out["sem_a"].dtype == np.int32
    assert out["sem_a"].max() <= 8  # value-table classes 0..8


def test_fid_pair_loader_returns_distinct_images(tmp_path):
    # Regression for the reference's utils.py:401 bug (image_a duplicated).
    rng = np.random.RandomState(5)
    a = rng.randint(0, 255, (64, 64, 3), np.uint8)
    b = 255 - a
    Image.fromarray(a).save(tmp_path / "a.png")
    Image.fromarray(b).save(tmp_path / "b.png")
    (tmp_path / "la.txt").write_text(str(tmp_path / "a.png"))
    (tmp_path / "lb.txt").write_text(str(tmp_path / "b.png"))
    ds = FidPairDataset(str(tmp_path / "la.txt"), str(tmp_path / "lb.txt"), 64)
    out = ds.get(0, np.random.default_rng(0))
    assert not np.allclose(out["image_a"], out["image_b"])
    np.testing.assert_allclose(out["image_b"], -out["image_a"], atol=0.01)


class _CountingDataset:
    """Synthetic dataset that counts get() calls (decode work)."""

    def __init__(self, n):
        self.n = n
        import threading
        self._lock = threading.Lock()
        self.calls = 0

    def __len__(self):
        return self.n

    def get(self, index, rng):
        with self._lock:
            self.calls += 1
        return {"image": np.full((4, 4, 3), index, np.float32)}


def test_loader_bounded_in_flight_submission():
    """The producer must never race ahead of the consumer by more than the
    in-flight window + output queue — NOT submit whole epochs up front
    (VERDICT r1 weak #4; the reference's torch DataLoader bounds the same
    way via its 2*num_workers index queue)."""
    import time

    ds = _CountingDataset(600)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=4,
                        seed=0, prefetch=2)
    it = iter(loader)
    consumed = 0
    for _ in range(3):
        next(it)
        consumed += 4
    time.sleep(0.5)  # let the producer race as far as it can
    bound = consumed + loader._in_flight_window() + \
        (loader.prefetch + 1) * loader.batch_size
    assert ds.calls <= bound, (ds.calls, bound)
    assert ds.calls < 100  # nowhere near the 600-sample epoch
    it.close()


def test_loader_single_epoch_drop_last_with_window():
    """batches() still yields exactly floor(n/batch) batches with the
    windowed producer, and every sample exactly once."""
    ds = _CountingDataset(10)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                        seed=0, prefetch=2)
    out = list(loader.batches())
    assert len(out) == 2
    seen = sorted(int(b["image"][i, 0, 0, 0]) for b in out for i in range(4))
    assert seen == list(range(8))


def test_jpeg_draft_decode_opt_in(tmp_path, monkeypatch):
    """MUNIT_JPEG_DRAFT=1: JPEGs decode at a DCT-domain reduced scale when a
    shorter-side resize follows — same output geometry, near-identical
    pixels; PNGs and the default (off) path are bit-identical."""
    from munit_tpu.data.datasets import ImageFilelist

    rng = np.random.RandomState(0)
    # smooth image: keeps the scaled-iDCT vs full-decode+resize delta small
    base = rng.randint(0, 40, (16, 20, 3), np.uint8).repeat(40, 0).repeat(40, 1)
    jpg = tmp_path / "big.jpg"
    Image.fromarray(base).save(jpg, quality=95)
    png = tmp_path / "big.png"
    Image.fromarray(base).save(png)
    for p, name in ((jpg, "jpg.txt"), (png, "png.txt")):
        (tmp_path / name).write_text(str(p))

    def sample(flist):
        ds = ImageFilelist("", str(tmp_path / flist), new_size=128,
                           height=128, width=128, train=False, cache_mb=0,
                           uint8_out=False)   # compare in [-1,1] floats
        return ds.get(0, np.random.default_rng(0))["image"]

    monkeypatch.delenv("MUNIT_JPEG_DRAFT", raising=False)
    off = sample("jpg.txt")
    off_png = sample("png.txt")
    monkeypatch.setenv("MUNIT_JPEG_DRAFT", "1")
    on = sample("jpg.txt")
    on_png = sample("png.txt")

    assert on.shape == off.shape == (128, 128, 3)
    # draft engaged (decode differs) but stays close on smooth content
    assert np.abs(on - off).mean() < 0.02          # [-1,1] scale
    np.testing.assert_array_equal(on_png, off_png)  # PNG: draft is a no-op


def test_loader_iter_from_exact_resume():
    """iter_from(k) continues the infinite stream exactly where a fresh
    iterator would be after consuming k batches — across epoch boundaries —
    and does NO decode work for the skipped batches."""
    ds = _CountingDataset(10)   # epoch = 2 usable batches of 4 (drop_last)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        seed=7, prefetch=2)
    it = iter(loader)
    ref = [next(it) for _ in range(6)]   # spans 3 epochs
    it.close()

    for k in (1, 2, 3, 5):               # incl. exact epoch boundary (2)
        ds2 = _CountingDataset(10)
        loader2 = DataLoader(ds2, batch_size=4, shuffle=True, num_workers=2,
                             seed=7, prefetch=2)
        it2 = loader2.iter_from(k)
        got = [next(it2) for _ in range(6 - k)]
        it2.close()
        for want, have in zip(ref[k:], got):
            np.testing.assert_array_equal(want["image"], have["image"])
        # skipped batches were never decoded (prefetch may run ahead a bit)
        assert ds2.calls <= (6 - k) * 4 + loader2._in_flight_window() + \
            (loader2.prefetch + 1) * loader2.batch_size


class _FlakyDataset(_CountingDataset):
    """index 3 is 'corrupt'."""

    def get(self, index, rng):
        if index == 3:
            raise OSError("truncated image")
        return super().get(index, rng)


def test_loader_skip_bad_opt_in(monkeypatch):
    """MUNIT_LOADER_SKIP_BAD=1 substitutes a corrupt sample with the next
    loadable index (logged) instead of killing training; default propagates."""
    loader = DataLoader(_FlakyDataset(8), batch_size=4, shuffle=False,
                        num_workers=2, seed=0, prefetch=2)
    it = iter(loader)
    with pytest.raises(OSError):
        for _ in range(2):
            next(it)
    it.close()

    monkeypatch.setenv("MUNIT_LOADER_SKIP_BAD", "1")
    loader2 = DataLoader(_FlakyDataset(8), batch_size=4, shuffle=False,
                         num_workers=2, seed=0, prefetch=2)
    it2 = iter(loader2)
    b0, b1 = next(it2), next(it2)
    it2.close()
    vals = [int(b["image"][i, 0, 0, 0]) for b in (b0, b1) for i in range(4)]
    assert vals == [0, 1, 2, 4, 4, 5, 6, 7]   # 3 → substituted by 4


def test_image_label_filelist(tmp_path):
    """Class labels derived from the first path segment (data.py:52-79)."""
    from munit_tpu.data.datasets import ImageLabelFilelist

    rng = np.random.RandomState(0)
    rels = []
    for cls in ("cats", "dogs"):
        (tmp_path / cls).mkdir()
        for i in range(2):
            rel = f"{cls}/{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (40, 40, 3), np.uint8)).save(tmp_path / rel)
            rels.append(rel)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(rels))
    ds = ImageLabelFilelist(str(tmp_path), str(lst), new_size=32, height=32,
                            width=32, train=False)
    assert ds.class_to_idx == {"cats": 0, "dogs": 1}
    labels = [int(ds.get(i, np.random.default_rng(0))["label"])
              for i in range(4)]
    assert labels == [0, 0, 1, 1]
    assert ds.get(0, np.random.default_rng(0))["image"].shape == (32, 32, 3)


def test_loader_errors_on_zero_usable_batches():
    """drop_last with len(dataset) < batch_size (e.g. a multi-host shard
    smaller than the per-host batch) must fail loudly, not spin the index
    stream forever with the consumer blocked on an empty queue."""
    import pytest

    ds = _CountingDataset(2)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        seed=0, prefetch=2)
    it = iter(loader)
    with pytest.raises(ValueError, match="0 usable batches"):
        next(it)
