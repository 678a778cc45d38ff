"""Decoded-image RAM cache + uint8 loader output (BENCH.md r2 e2e: the
1-core host cannot decode per-draw; decode+resize is draw-independent).

Pins the two load-bearing claims:
1. PIL's fixed-point resampling commutes EXACTLY with horizontal mirroring,
   so the cached path (flip applied post-resize to a mirrored crop window)
   is bit-exact to the reference order flip→resize→crop (utils.py:287-337).
2. On-device uint8 normalization reproduces the host float path exactly
   (same op order: (x/255)*2-1).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from munit_tpu.data import transforms as T
from munit_tpu.data.datasets import ImageFilelist, ImageMaskDataset


def _rng(seed):
    return np.random.default_rng(np.random.SeedSequence([seed]))


def _write_corpus(tmp_path, n=4, mask_values=(0, 255)):
    rng = np.random.RandomState(7)
    imgs, masks = [], []
    for i in range(n):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            p, quality=92)
        imgs.append(str(p))
        m = tmp_path / f"m{i}.png"
        arr = rng.choice(mask_values, (96, 128)).astype(np.uint8)
        Image.fromarray(arr).save(m)
        masks.append(str(m))
    il, ml = tmp_path / "i.txt", tmp_path / "m.txt"
    il.write_text("\n".join(imgs))
    ml.write_text("\n".join(masks))
    return str(il), str(ml)


def test_flip_commutes_with_pil_resize():
    rng = np.random.RandomState(0)
    for shape, size in [((96, 128, 3), 64), ((128, 96, 3), 80),
                        ((100, 100, 3), 77)]:
        img = Image.fromarray(rng.randint(0, 255, shape, np.uint8))
        a = np.asarray(T.resize_shorter(
            img.transpose(Image.FLIP_LEFT_RIGHT), size))
        b = np.asarray(T.resize_shorter(img, size))[:, ::-1]
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mask_values", [(0, 255), (0, 1)])
def test_mask_dataset_cached_bit_exact(tmp_path, monkeypatch, mask_values):
    monkeypatch.setenv("MUNIT_NATIVE_IMAGEOPS", "0")
    il, ml = _write_corpus(tmp_path, mask_values=mask_values)
    plain = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=0, uint8_out=False)
    cached = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=64,
                              uint8_out=False)
    for idx in range(4):
        for seed in range(5):
            a = plain.get(idx, _rng(seed))
            b = cached.get(idx, _rng(seed))
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["mask"], b["mask"])
    assert cached.cache.nbytes > 0


@pytest.mark.parametrize("train", [True, False])
def test_filelist_cached_bit_exact(tmp_path, monkeypatch, train):
    monkeypatch.setenv("MUNIT_NATIVE_IMAGEOPS", "0")
    il, _ = _write_corpus(tmp_path)
    plain = ImageFilelist("", il, 72, 64, 64, train, cache_mb=0,
                          uint8_out=False)
    cached = ImageFilelist("", il, 72, 64, 64, train, cache_mb=64,
                           uint8_out=False)
    for idx in range(4):
        for seed in range(5):
            np.testing.assert_array_equal(
                plain.get(idx, _rng(seed))["image"],
                cached.get(idx, _rng(seed))["image"])


def test_uint8_device_normalize_matches_host(tmp_path, monkeypatch):
    monkeypatch.setenv("MUNIT_NATIVE_IMAGEOPS", "0")
    il, ml = _write_corpus(tmp_path)
    f32 = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=64, uint8_out=False)
    u8 = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=64, uint8_out=True)
    from munit_tpu.data.loader import DataLoader, device_prefetch
    ld = DataLoader(u8, batch_size=2, shuffle=False, num_workers=1, seed=3)
    it = device_prefetch(iter(ld), size=1)
    batch = next(it)
    assert batch["image"].dtype == jnp.float32
    assert batch["mask"].dtype == jnp.float32
    # replay the same draws through the float dataset
    ld_f = DataLoader(f32, batch_size=2, shuffle=False, num_workers=1, seed=3)
    ref = next(iter(ld_f))
    # XLA folds (x/255)*2 into one fma → ≤1 ulp vs the host op order
    np.testing.assert_allclose(np.asarray(batch["image"]), ref["image"],
                               atol=1.3e-7, rtol=0)
    np.testing.assert_array_equal(np.asarray(batch["mask"]), ref["mask"])


def test_cache_budget_zero_disables(tmp_path):
    il, ml = _write_corpus(tmp_path)
    ds = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=0)
    assert ds.cache is None


def test_cache_budget_bounds_insertion(tmp_path):
    il, ml = _write_corpus(tmp_path)
    ds = ImageMaskDataset(il, ml, 72, 64, 64, cache_mb=64)
    # pretend the budget is one sample's worth
    ds.cache.budget = 1
    ds.get(0, _rng(0))
    ds.get(1, _rng(0))
    assert ds.cache.nbytes <= 1 or len(ds.cache.data) <= 1
