"""ctypes bindings for the native host-side input pipeline (native/augment.cpp).

One multithreaded C++ pass fuses batch gather + zero-pad + random crop +
horizontal flip on uint8 NHWC images, replacing three numpy fancy-indexing
passes. Falls back to the numpy implementations in data/augment.py when the
shared library hasn't been built (``cd native && make``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libcausal_gen_native.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.cg_gather_crop_flip.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32p, i32p, u8p, u8p,
        ]
        lib.cg_gather.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64, u8p,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def gather_crop_flip(
    images: np.ndarray,  # (N_src, H, W, C) uint8, contiguous
    idx: np.ndarray,  # (n,) int
    rng: np.random.Generator,
    out_size: Tuple[int, int],
    padding: Tuple[int, int] = (0, 0),
    hflip_p: float = 0.0,
) -> Optional[np.ndarray]:
    """Fused batch assembly; returns None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images)
    n = len(idx)
    n_src, h, w, c = images.shape
    out_h, out_w = out_size
    ph, pw = padding
    ys = rng.integers(0, h + 2 * ph - out_h + 1, size=n).astype(np.int32)
    xs = rng.integers(0, w + 2 * pw - out_w + 1, size=n).astype(np.int32)
    flips = (
        (rng.random(n) < hflip_p).astype(np.uint8)
        if hflip_p > 0
        else np.zeros(n, np.uint8)
    )
    idx64 = np.ascontiguousarray(idx, np.int64)
    out = np.empty((n, out_h, out_w, c), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.cg_gather_crop_flip(
        _ptr(images, u8p), n_src, h, w, c,
        _ptr(idx64, i64p), n, ph, pw, out_h, out_w,
        _ptr(ys, i32p), _ptr(xs, i32p), _ptr(flips, u8p), _ptr(out, u8p),
    )
    return out


def gather(images: np.ndarray, idx: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images)
    idx64 = np.ascontiguousarray(idx, np.int64)
    n = len(idx64)
    img_bytes = int(np.prod(images.shape[1:]))
    out = np.empty((n, *images.shape[1:]), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.cg_gather(_ptr(images, u8p), images.shape[0], img_bytes,
                  _ptr(idx64, i64p), n, _ptr(out, u8p))
    return out
