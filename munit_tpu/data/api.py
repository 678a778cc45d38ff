"""Loader factory API mirroring the reference's utils.py entry points
(get_all_data_loaders utils.py:50-156; get_data_loader_list :192-250;
get_data_loader_mask_and_im :638-677; get_synthetic_data_loader :552-635;
get_fid_data_loader :408-455; get_data_loader_folder :680-740)."""

from __future__ import annotations

from typing import Optional

from munit_tpu.data.datasets import (
    FidPairDataset, ImageFilelist, ImageFolder, ImageMaskDataset,
    SyntheticPairDataset,
)
from munit_tpu.data.loader import DataLoader as _ThreadedDataLoader


def DataLoader(*args, **kwargs):
    """Loader-backend selector: the in-house threaded loader by default;
    MUNIT_LOADER=grain swaps in the Grain-backed one (process workers +
    checkpointable iterator state — see data/grain_loader.py). Both take
    the same arguments and yield the same dict-of-stacked-arrays batches."""
    import os
    if os.environ.get("MUNIT_LOADER", "threads") == "grain":
        from munit_tpu.data.grain_loader import GrainDataLoader
        return GrainDataLoader(*args, **kwargs)
    return _ThreadedDataLoader(*args, **kwargs)


def get_data_loader_list(root, file_list, batch_size, train, new_size=None,
                         height=256, width=256, num_workers=4, crop=True,
                         seed=0, **shard):
    ds = ImageFilelist(root, file_list, new_size, height, width, train, crop)
    return DataLoader(ds, batch_size, shuffle=train, num_workers=num_workers,
                      seed=seed, **shard)


def get_data_loader_folder(input_folder, batch_size, train, new_size=None,
                           height=256, width=256, num_workers=4, crop=True,
                           return_paths=False, seed=0, **shard):
    ds = ImageFolder(input_folder, new_size, height, width, train, crop,
                     return_paths=return_paths)
    return DataLoader(ds, batch_size, shuffle=train, num_workers=num_workers,
                      seed=seed, **shard)


def get_data_loader_mask_and_im(file_list, mask_list, batch_size, train,
                                new_size=None, height=256, width=256,
                                num_workers=4, crop=True, seed=0, **shard):
    ds = ImageMaskDataset(file_list, mask_list, new_size, height, width)
    return DataLoader(ds, batch_size, shuffle=train, num_workers=num_workers,
                      seed=seed, **shard)


def get_synthetic_data_loader(file_list_a, file_list_b, mask_list, sem_list_a,
                              sem_list_b, batch_size, train, new_size=256,
                              height=256, width=256, num_workers=4, crop=True,
                              seed=0, **shard):
    ds = SyntheticPairDataset(file_list_a, file_list_b, mask_list, sem_list_a,
                              sem_list_b, new_size, height, width)
    return DataLoader(ds, batch_size, shuffle=train, num_workers=num_workers,
                      seed=seed, **shard)


def _resized_shapes(paths, new_size):
    """Post-shorter-side-resize (H, W) per image, from PIL headers only
    (no pixel decode)."""
    from PIL import Image
    shapes = set()
    for p in paths:
        with Image.open(p) as im:
            w, h = im.size
        # must mirror transforms.resize_shorter's rounding exactly
        if w <= h:
            shapes.add((max(1, round(h * new_size / w)), new_size))
        else:
            shapes.add((new_size, max(1, round(w * new_size / h))))
    return shapes


def get_fid_data_loader(file_list_a, file_list_b, batch_size, train=False,
                        new_size=256, num_workers=4, seed=0, **shard):
    ds = FidPairDataset(file_list_a, file_list_b, new_size)
    if batch_size > 1:
        # The FID transform is shorter-side resize (reference
        # utils.py:389-391), so mixed-aspect lists produce unstackable
        # batches — the reference's torch DataLoader crashes there. Fall
        # back to per-image batches for such lists (the inception protocol
        # bilinearly resizes to 299² downstream, so per-image is exact).
        # image_a and image_b stack as SEPARATE batch keys, so each list only
        # needs to be internally uniform — different aspect ratios between
        # the two lists are fine.
        from munit_tpu.data.datasets import read_filelist
        mixed = (len(_resized_shapes(read_filelist(file_list_a), new_size)) > 1
                 or len(_resized_shapes(read_filelist(file_list_b),
                                        new_size)) > 1)
        if mixed:
            import sys
            print("fid loader: mixed image shapes after resize — using "
                  "batch_size=1", file=sys.stderr)
            batch_size = 1
    return DataLoader(ds, batch_size, shuffle=False, num_workers=num_workers,
                      seed=seed, **shard)


def get_all_data_loaders(conf, seed=0, **shard):
    """trainA/B + testA/B loaders (utils.py:50-156). Folder mode via
    ``data_root``; list mode via ``data_folder_*``/``data_list_*``."""
    bs, nw = conf["batch_size"], conf["num_workers"]
    new_size = conf.get("new_size")
    h, w = conf["crop_image_height"], conf["crop_image_width"]
    if conf.get("data_root"):
        import os
        mk = lambda sub, train, hh, ww: get_data_loader_folder(
            os.path.join(conf["data_root"], sub), bs, train, new_size, hh, ww,
            nw, True, seed=seed, **shard)
        return (mk("trainA", True, h, w), mk("trainB", True, h, w),
                mk("testA", False, new_size, new_size),
                mk("testB", False, new_size, new_size))
    mk = lambda root_k, list_k, train, hh, ww: get_data_loader_list(
        conf[root_k], conf[list_k], bs, train, new_size, hh, ww, nw, True,
        seed=seed, **shard)
    return (
        mk("data_folder_train_a", "data_list_train_a", True, h, w),
        mk("data_folder_train_b", "data_list_train_b", True, h, w),
        mk("data_folder_test_a", "data_list_test_a", False, new_size, new_size),
        mk("data_folder_test_b", "data_list_test_b", False, new_size, new_size),
    )
