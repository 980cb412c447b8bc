"""ctypes bindings for the native preprocessing library.

Builds ``augment.cpp`` with g++ (-O3, OpenMP) on first use and caches the
shared object next to the source; falls back gracefully (``lib() is None``)
when no compiler is available so the numpy/cv2 path keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "augment.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libdynmm_augment.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"dynmm native build failed ({e}); using numpy/cv2 fallback")
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The loaded shared library, building it on first call; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        l = ctypes.CDLL(_SO)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        l.resize_bilinear_f32.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
        l.resize_nearest_f32.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
        l.resize_nearest_i32.argtypes = [i32p] + [ctypes.c_int] * 3 + [i32p] + [ctypes.c_int] * 2
        l.normalize_rgb_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int, f32p]
        l.normalize_depth_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int, f32p]
        l.space_to_depth_f32.argtypes = [f32p] + [ctypes.c_int] * 4 + [f32p]
        _lib = l
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def resize(img: np.ndarray, height: int, width: int, nearest: bool) -> np.ndarray:
    """cv2-semantics resize via the native lib. img: (H, W[, C]) float32 or
    int32 (nearest only for ints)."""
    l = lib()
    assert l is not None, "native lib unavailable"
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    if img.dtype == np.float32:
        out = np.empty((height, width, c), np.float32)
        fn = l.resize_nearest_f32 if nearest else l.resize_bilinear_f32
        fn(_fp(img), h, w, c, _fp(out), height, width)
    elif img.dtype == np.int32 and nearest:
        out = np.empty((height, width, c), np.int32)
        l.resize_nearest_i32(_ip(img), h, w, c, _ip(out), height, width)
    else:
        raise TypeError(f"unsupported dtype {img.dtype} nearest={nearest}")
    return out[:, :, 0] if squeeze else out


def normalize_rgb(img: np.ndarray, mean, std, flip: bool = False) -> np.ndarray:
    l = lib()
    assert l is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, _ = img.shape
    out = np.empty_like(img)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    l.normalize_rgb_f32(_fp(img), h, w, _fp(mean), _fp(std), int(flip), _fp(out))
    return out


def normalize_depth(
    depth: np.ndarray, mean: float, std: float, keep_zeros: bool = False,
    flip: bool = False,
) -> np.ndarray:
    l = lib()
    assert l is not None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    out = np.empty_like(depth)
    l.normalize_depth_f32(
        _fp(depth), h, w, float(mean), float(std), int(keep_zeros), int(flip),
        _fp(out),
    )
    return out


def space_to_depth(x: np.ndarray) -> np.ndarray:
    """2×2 space-to-depth (N, H, W, C) → (N, H/2, W/2, 4C), channel order
    (row parity, col parity, c) — layout-identical to
    ``models.resnet.space_to_depth_host``'s numpy form. 2.5× faster than
    the numpy transpose on a single core (copy-bandwidth-bound); OpenMP
    scales it across cores on multi-core serving hosts."""
    l = lib()
    assert l is not None
    x = np.ascontiguousarray(x, np.float32)
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = np.empty((n, h // 2, w // 2, 4 * c), np.float32)
    l.space_to_depth_f32(_fp(x), n, h, w, c, _fp(out))
    return out
