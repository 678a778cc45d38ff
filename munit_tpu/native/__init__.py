"""ctypes bindings for the native image-ops library.

Builds ``libmunit_imageops.so`` from imageops.cpp on first import (g++ -O3);
falls back to the PIL path transparently if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libmunit_imageops.so")
_SRC = os.path.join(_HERE, "imageops.cpp")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-ffast-math", "-funroll-loops", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.mt_transform.argtypes = [u8p] + [ctypes.c_int] * 10 + [f32p]
    lib.mt_transform.restype = ctypes.c_int
    lib.mt_transform_nearest.argtypes = [u8p] + [ctypes.c_int] * 8 + [u8p]
    lib.mt_transform_nearest.restype = ctypes.c_int
    lib.mt_resized_dims.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    i32p, i32p]
    lib.mt_resized_dims.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def resized_dims(h: int, w: int, new_size: int) -> Tuple[int, int]:
    lib = get_lib()
    rh, rw = ctypes.c_int(), ctypes.c_int()
    lib.mt_resized_dims(h, w, new_size, ctypes.byref(rh), ctypes.byref(rw))
    return rh.value, rw.value


def fused_transform(src: np.ndarray, flip: bool, new_size: int,
                    crop_i: int, crop_j: int, crop_h: int, crop_w: int,
                    normalize: bool = True) -> np.ndarray:
    """uint8 HWC → float32 crop HWC in one native pass."""
    lib = get_lib()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w = src.shape[:2]
    c = 1 if src.ndim == 2 else src.shape[2]
    out = np.empty((crop_h, crop_w, c), np.float32)
    rc = lib.mt_transform(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        int(flip), new_size, crop_i, crop_j, crop_h, crop_w, int(normalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"mt_transform failed: {rc}")
    return out


def fused_transform_nearest(src: np.ndarray, flip: bool, new_size: int,
                            crop_i: int, crop_j: int, crop_h: int,
                            crop_w: int) -> np.ndarray:
    """uint8 HW → uint8 crop HW (masks / semantic maps)."""
    lib = get_lib()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim == 3:
        src = src[:, :, 0]
    h, w = src.shape
    out = np.empty((crop_h, crop_w), np.uint8)
    rc = lib.mt_transform_nearest(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(flip), new_size, crop_i, crop_j, crop_h, crop_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"mt_transform_nearest failed: {rc}")
    return out
