"""Native image-ops library: builds, binds, and matches the PIL path within
interpolation tolerance; throughput sanity check."""

import time

import numpy as np
import pytest
from PIL import Image

from munit_tpu import native
from munit_tpu.data import transforms as T


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resized_dims_match_pil_semantics():
    for h, w, s in [(80, 100, 64), (100, 80, 64), (256, 256, 256),
                    (375, 500, 256)]:
        rh, rw = native.resized_dims(h, w, s)
        img = Image.new("RGB", (w, h))
        out = T.resize_shorter(img, s)
        assert (out.size[1], out.size[0]) == (rh, rw)


def test_fused_transform_matches_pil_pipeline():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (96, 128, 3), np.uint8)
    img = Image.fromarray(src)
    new_size, ch, cw, ci, cj = 64, 48, 48, 5, 9

    for flip in (False, True):
        pil_img = img.transpose(Image.FLIP_LEFT_RIGHT) if flip else img
        pil_img = T.resize_shorter(pil_img, new_size)
        want = T.normalize_pm1(T.to_array01(
            T.crop(pil_img, ci, cj, ch, cw)))
        got = native.fused_transform(src, flip, new_size, ci, cj, ch, cw)
        assert got.shape == want.shape
        # PIL bilinear uses a slightly different filter footprint; mean
        # difference should still be a fraction of one 8-bit step
        assert np.mean(np.abs(got - want)) < 2.5 / 255.0 * 2


def test_nearest_transform_matches_pil():
    rng = np.random.RandomState(1)
    src = (rng.rand(96, 128) > 0.5).astype(np.uint8) * 255
    img = Image.fromarray(src)
    new_size, ch, cw, ci, cj = 64, 48, 48, 2, 3
    rimg = img.resize(
        (native.resized_dims(96, 128, new_size)[1],
         native.resized_dims(96, 128, new_size)[0]), Image.NEAREST)
    want = np.asarray(T.crop(rimg, ci, cj, ch, cw))
    got = native.fused_transform_nearest(src, False, new_size, ci, cj, ch, cw)
    assert got.shape == want.shape
    assert np.mean(got != want) < 0.05  # rounding-rule edge pixels only


def test_native_is_faster_than_pil_chain():
    rng = np.random.RandomState(2)
    src = rng.randint(0, 255, (600, 800, 3), np.uint8)
    img = Image.fromarray(src)

    def pil_once():
        r = T.resize_shorter(img, 256)
        return T.normalize_pm1(T.to_array01(T.crop(r, 0, 0, 256, 256)))

    def native_once():
        return native.fused_transform(src, False, 256, 0, 0, 256, 256)

    pil_once(), native_once()  # warm
    t0 = time.time()
    for _ in range(10):
        pil_once()
    t_pil = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        native_once()
    t_nat = time.time() - t0
    # don't assert a hard ratio (CI noise); just report + sanity bound
    assert t_nat < t_pil * 2.0, (t_nat, t_pil)
