"""ctypes binding for the native data-prep library (compiled on demand).

Falls back to the PIL/numpy paths in `transforms.py` / `depth_maps.py` when the
toolchain or libjpeg is unavailable; `available()` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "dataloader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "csrc", "libracloader.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rac_decode_jpeg.restype = ctypes.c_int
    lib.rac_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rac_resize_crop_flip.restype = None
    lib.rac_resize_crop_flip.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.rac_radar_columns.restype = None
    lib.rac_radar_columns.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes, max_hw=(1000, 1700)) -> Optional[np.ndarray]:
    """Decode JPEG bytes -> RGB uint8 [h, w, 3], or None on failure."""
    lib = _load()
    if lib is None:
        return None
    mh, mw = max_hw
    buf = np.empty((mh, mw * 3), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.rac_decode_jpeg(
        data, len(data), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mw, mh, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    out = buf.reshape(-1)[: h.value * w.value * 3]
    return out.reshape(h.value, w.value, 3).copy()


def resize_crop_flip(img: np.ndarray, scale: float, crop_xy: Tuple[int, int],
                     flip: bool, out_hw: Tuple[int, int],
                     to_bgr: bool = True) -> np.ndarray:
    """Fused resize+crop+flip(+RGB->BGR) -> float32 [out_h, out_w, 3]."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    oh, ow = out_hw
    out = np.empty((oh, ow, 3), np.float32)
    lib.rac_resize_crop_flip(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], scale, crop_xy[0], crop_xy[1],
        int(flip), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, int(to_bgr),
    )
    return out


def radar_columns(uvdr: np.ndarray, hw: Tuple[int, int],
                  d_range=(1.0, 65.0)) -> Tuple[np.ndarray, np.ndarray]:
    """uvdr: [n, 4] projected (u, v, depth, rcs) -> (depth [h,w], rcs [h,w])."""
    lib = _load()
    assert lib is not None
    uvdr = np.ascontiguousarray(uvdr, np.float32)
    h, w = hw
    depth = np.empty((h, w), np.float32)
    rcs = np.empty((h, w), np.float32)
    lib.rac_radar_columns(
        uvdr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(uvdr),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, d_range[0], d_range[1],
    )
    return depth, rcs
