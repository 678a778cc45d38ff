"""Dataset abstractions (index → sample), mirroring data.py + utils.py.

A dataset is a sized object whose ``get(index, rng)`` returns a dict of numpy
arrays (NHWC float32 images in [-1,1], float {0,1} masks, int32 class maps).
Randomness comes from the per-call ``rng`` so epochs are reproducible and
host-shardable.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from munit_tpu.data import transforms as T

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


def _open_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


class ImageFilelist:
    """root + txt list of paths → transformed image (data.py:26-49)."""

    def __init__(self, root: str, flist: str, new_size: Optional[int],
                 height: int, width: int, train: bool, crop: bool = True):
        self.root = root
        self.paths = read_filelist(flist)
        self.new_size, self.h, self.w = new_size, height, width
        self.train, self.crop = train, crop

    def __len__(self):
        return len(self.paths)

    def get(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        img = _open_rgb(os.path.join(self.root, self.paths[index]))
        x = T.image_transform(rng, img, self.new_size, self.h, self.w,
                              self.train, self.crop)
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
                 return_paths: bool = False):
        self.root = ""
        self.paths = scan_folder(folder)
        self.new_size, self.h, self.w = new_size, height, width
        self.train, self.crop = train, crop
        self.return_paths = return_paths

    def get(self, index, rng):
        out = super().get(index, rng)
        if self.return_paths:
            out["path"] = self.paths[index]
        return out


class ImageMaskDataset:
    """(image, water/ground mask) pairs with joint transform
    (MyDataset, utils.py:270-363)."""

    def __init__(self, file_list: str, mask_list: Optional[str],
                 new_size: int, height: int, width: int):
        self.paths = read_filelist(file_list)
        self.mask_paths = read_filelist(mask_list) if mask_list else None
        self.new_size, self.h, self.w = new_size, height, width

    def __len__(self):
        return len(self.paths)

    def get(self, index, rng):
        img = _open_rgb(self.paths[index])
        mask = (Image.open(self.mask_paths[index])
                if self.mask_paths else None)
        x, m = T.image_mask_transform(rng, img, mask, self.new_size,
                                      self.h, self.w)
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
            T.resize_shorter(_open_rgb(self.a[index]), self.new_size)))
        b = T.normalize_pm1(T.to_array01(
            T.resize_shorter(_open_rgb(self.b[index]), self.new_size)))
        return {"image_a": a, "image_b": b}
