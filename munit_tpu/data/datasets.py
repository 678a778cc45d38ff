"""Dataset abstractions (index → sample), mirroring data.py + utils.py.

A dataset is a sized object whose ``get(index, rng)`` returns a dict of numpy
arrays (NHWC float32 images in [-1,1], float {0,1} masks, int32 class maps).
Randomness comes from the per-call ``rng`` so epochs are reproducible and
host-shardable.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from munit_tpu.data import transforms as T


class _DecodeCache:
    """Byte-bounded RAM cache of decoded+resized uint8 arrays.

    On a CPU-starved host (this image exposes ONE core) JPEG decode+resize is
    the training bottleneck, not the TPU (BENCH.md r2 e2e row): each image is
    drawn many times per epoch but its decode+resize result is
    draw-independent — only the flip/crop varies. Caching the resized uint8
    array makes the steady-state per-draw cost a crop + flip slice.
    Thread-safe (loader workers share it); stops inserting at the budget
    (first-come residency, no eviction — epochs revisit the same indices).
    """

    def __init__(self, budget_bytes: int):
        self.budget = budget_bytes
        self.data: Dict[int, tuple] = {}
        self.nbytes = 0
        self.lock = threading.Lock()

    def __getstate__(self):
        # Picklable into grain multiprocessing workers: ship the budget
        # only — each worker warms its own cache for the records it owns.
        return {"budget": self.budget}

    def __setstate__(self, state):
        self.__init__(state["budget"])

    def get(self, key):
        return self.data.get(key)

    def put(self, key, arrays: tuple):
        size = sum(int(a.nbytes) for a in arrays if a is not None)
        with self.lock:
            if key in self.data or self.nbytes + size > self.budget:
                return
            self.data[key] = arrays
            self.nbytes += size


def _cache_budget_bytes() -> int:
    """MUNIT_CACHE_MB (default 2048; 0 disables the decoded-image cache)."""
    return int(os.environ.get("MUNIT_CACHE_MB", "2048")) << 20


def _uint8_out_default(train: bool) -> bool:
    """MUNIT_LOADER_UINT8 (default ON for TRAINING datasets): emit uint8
    images/binary masks; the device prefetch stage normalizes on-TPU (4x
    less H2D traffic, no host-side float conversion on the single CPU
    core). Device vs host normalization is pinned to <=1 ulp
    (tests/test_loader_cache.py). Eval/inference datasets (train=False)
    keep f32 output — their consumers (translate_batch, FID loaders) read
    samples directly without the device_prefetch normalization point.

    Default flipped ON in r4: the r4 production soak measured the f32-H2D
    default at ~12 img/s against the same workload's 122 img/s compute —
    the tunnel H2D of f32 batches dominated the loop, while every BENCH.md
    e2e number had been measured with uint8 mode explicitly on
    (tools/bench_e2e.py). Set MUNIT_LOADER_UINT8=0 for the old behavior."""
    return train and os.environ.get("MUNIT_LOADER_UINT8", "1") == "1"


def _setup_cache(obj, cache_mb, uint8_out, cacheable: bool,
                 train: bool = True):
    budget = _cache_budget_bytes() if cache_mb is None else cache_mb << 20
    obj.cache = _DecodeCache(budget) if budget > 0 and cacheable else None
    obj.uint8_out = (_uint8_out_default(train) if uint8_out is None
                     else uint8_out)


IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".JPG", ".JPEG",
                  ".PNG", ".PPM", ".BMP")


def read_filelist(path: str) -> List[str]:
    """txt list, one path per line (default_txt_reader, utils.py:253-266)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                out.append(parts[0])
    return out


def scan_folder(folder: str) -> List[str]:
    """Recursive scan by extension (data.py ImageFolder/make_dataset)."""
    images = []
    for root, _, fnames in sorted(os.walk(folder)):
        for fname in sorted(fnames):
            if fname.endswith(IMG_EXTENSIONS):
                images.append(os.path.join(root, fname))
    if not images:
        raise RuntimeError(f"Found 0 images in: {folder}")
    return images


def _open_rgb(path: str, target: Optional[int] = None) -> Image.Image:
    """Decode to RGB. With MUNIT_JPEG_DRAFT=1 and a downstream shorter-side
    resize ``target``, JPEGs decode at the largest DCT-domain 1/1..1/8 scale
    whose result still covers the target (PIL ``draft``) — 2-4x faster decode
    when the source is much larger than ``new_size``. OPT-IN because the
    scaled iDCT pixels differ slightly from full-res decode + resize (the
    reference decodes full-res), so golden-parity runs keep it off."""
    img = Image.open(path)
    if (target and img.format == "JPEG"
            and os.environ.get("MUNIT_JPEG_DRAFT", "0") == "1"):
        img.draft("RGB", (int(target), int(target)))
    return img.convert("RGB")


class ImageFilelist:
    """root + txt list of paths → transformed image (data.py:26-49)."""

    def __init__(self, root: str, flist: str, new_size: Optional[int],
                 height: int, width: int, train: bool, crop: bool = True,
                 cache_mb: Optional[int] = None,
                 uint8_out: Optional[bool] = None):
        self.root = root
        self.paths = read_filelist(flist)
        self.new_size, self.h, self.w = new_size, height, width
        self.train, self.crop = train, crop
        _setup_cache(self, cache_mb, uint8_out, bool(new_size and crop),
                     train=train)

    def __len__(self):
        return len(self.paths)

    def get(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        if self.cache is not None:
            hit = self.cache.get(index)
            if hit is None:
                img = _open_rgb(os.path.join(self.root, self.paths[index]),
                                self.new_size)
                hit = (np.asarray(T.resize_shorter(img, self.new_size)),)
                self.cache.put(index, hit)
            x = T.image_transform_cached(rng, hit[0], self.h, self.w,
                                         self.train, self.uint8_out)
            return {"image": x}
        img = _open_rgb(os.path.join(self.root, self.paths[index]),
                        self.new_size)
        x = T.image_transform(rng, img, self.new_size, self.h, self.w,
                              self.train, self.crop)
        if self.uint8_out:
            x = np.round((x + 1.0) * 127.5).astype(np.uint8)
        return {"image": x}


class ImageLabelFilelist(ImageFilelist):
    """List dataset with class labels derived from the first path segment
    (data.py:52-79). Unused by the reference entry points; kept for parity."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        classes = sorted({p.split("/")[0] for p in self.paths})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}

    def get(self, index, rng):
        out = super().get(index, rng)
        out["label"] = np.int32(
            self.class_to_idx[self.paths[index].split("/")[0]])
        return out


class ImageFolder(ImageFilelist):
    """Recursive folder dataset (data.py:109-155); optionally returns paths."""

    def __init__(self, folder: str, new_size: Optional[int], height: int,
                 width: int, train: bool, crop: bool = True,
                 return_paths: bool = False,
                 cache_mb: Optional[int] = None,
                 uint8_out: Optional[bool] = None):
        self.root = ""
        self.paths = scan_folder(folder)
        self.new_size, self.h, self.w = new_size, height, width
        self.train, self.crop = train, crop
        self.return_paths = return_paths
        _setup_cache(self, cache_mb, uint8_out, bool(new_size and crop),
                     train=train)

    def get(self, index, rng):
        out = super().get(index, rng)
        if self.return_paths:
            out["path"] = self.paths[index]
        return out


class ImageMaskDataset:
    """(image, water/ground mask) pairs with joint transform
    (MyDataset, utils.py:270-363)."""

    def __init__(self, file_list: str, mask_list: Optional[str],
                 new_size: int, height: int, width: int,
                 cache_mb: Optional[int] = None,
                 uint8_out: Optional[bool] = None):
        self.paths = read_filelist(file_list)
        self.mask_paths = read_filelist(mask_list) if mask_list else None
        self.new_size, self.h, self.w = new_size, height, width
        _setup_cache(self, cache_mb, uint8_out, bool(new_size))

    def __len__(self):
        return len(self.paths)

    def _decode_resized(self, index):
        img = T.resize_shorter(_open_rgb(self.paths[index], self.new_size),
                               self.new_size)
        mask = mask_flip = None
        if self.mask_paths:
            def prep(m):
                arr = np.asarray(m.resize(img.size, Image.NEAREST))
                if arr.ndim == 3:
                    arr = arr[..., 0]
                return (arr if arr.dtype == np.uint8
                        else arr.astype(np.uint8))
            m = Image.open(self.mask_paths[index])
            # NEAREST doesn't commute with mirroring: store both orientations
            # (see image_mask_transform_cached)
            mask = prep(m)
            mask_flip = prep(m.transpose(Image.FLIP_LEFT_RIGHT))
        return np.asarray(img), mask, mask_flip

    def get(self, index, rng):
        if self.cache is not None:
            hit = self.cache.get(index)
            if hit is None:
                hit = self._decode_resized(index)
                self.cache.put(index, hit)
            x, m = T.image_mask_transform_cached(rng, hit[0], hit[1], hit[2],
                                                 self.h, self.w,
                                                 self.uint8_out)
            return {"image": x, "mask": m}
        img = _open_rgb(self.paths[index], self.new_size)
        mask = (Image.open(self.mask_paths[index])
                if self.mask_paths else None)
        x, m = T.image_mask_transform(rng, img, mask, self.new_size,
                                      self.h, self.w)
        if self.uint8_out:
            x = np.round((x + 1.0) * 127.5).astype(np.uint8)
            m = (m > 0.5).astype(np.uint8)
        return {"image": x, "mask": m}


class SyntheticPairDataset:
    """Unity 5-tuple (img_a, img_b, mask, sem_a, sem_b)
    (MyDatasetSynthetic, utils.py:458-635)."""

    def __init__(self, list_a: str, list_b: str, mask_list: str,
                 sem_list_a: str, sem_list_b: str, new_size: int,
                 height: int, width: int):
        self.a = read_filelist(list_a)
        self.b = read_filelist(list_b)
        self.masks = read_filelist(mask_list)
        self.sem_a = read_filelist(sem_list_a)
        self.sem_b = read_filelist(sem_list_b)
        self.new_size, self.h, self.w = new_size, height, width

    def __len__(self):
        return len(self.a)

    def get(self, index, rng):
        a, b, m, sa, sb = T.synthetic_transform(
            rng, _open_rgb(self.a[index]), _open_rgb(self.b[index]),
            Image.open(self.masks[index]).convert("L"),
            Image.open(self.sem_a[index]).convert("L"),
            Image.open(self.sem_b[index]).convert("L"),
            self.new_size, self.h, self.w)
        return {"image_a": a, "image_b": b, "mask": m,
                "sem_a": sa, "sem_b": sb}


class FidPairDataset:
    """Paired (a, b) resize-only loader for FID
    (DatasetInferenceFID, utils.py:366-455). The reference's
    ``image_b = normalizer(image_a)`` copy-paste bug (utils.py:401) is FIXED:
    b really is image_b here."""

    def __init__(self, list_a: str, list_b: str, new_size: int):
        self.a = read_filelist(list_a)
        self.b = read_filelist(list_b)
        self.new_size = new_size

    def __len__(self):
        return len(self.a)

    def get(self, index, rng):
        a = T.normalize_pm1(T.to_array01(
            T.resize_shorter(_open_rgb(self.a[index], self.new_size),
                             self.new_size)))
        b = T.normalize_pm1(T.to_array01(
            T.resize_shorter(_open_rgb(self.b[index], self.new_size),
                             self.new_size)))
        return {"image_a": a, "image_b": b}
