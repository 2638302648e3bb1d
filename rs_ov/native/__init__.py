"""Native (C++/OpenMP) host-side preprocessing, bound via ctypes.

Compiled on first use by :func:`get_lib`; every entry point has a numpy
fallback so the framework never hard-requires the toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "normalize_hwc_to_chw", "extract_tiles_chw", "available",
           "decode_rgb", "decode_gray", "decode_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_DECODE_SRC = os.path.join(_DIR, "decode.cpp")
_LIB = os.path.join(_DIR, "_libpreprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    base = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17"]
    # preferred: preprocess + image decode (needs libpng/libjpeg to link);
    # fallback: preprocess alone (decode_* then degrade to PIL)
    for srcs, libs in (([_SRC, _DECODE_SRC], ["-lpng", "-ljpeg"]),
                       ([_SRC], [])):
        try:
            subprocess.run(base + srcs + ["-o", _LIB] + libs,
                           check=True, capture_output=True, timeout=120)
            return _LIB
        except Exception:
            continue
    return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        newest_src = max(os.path.getmtime(s) for s in (_SRC, _DECODE_SRC)
                         if os.path.exists(s))
        path = _LIB if os.path.exists(_LIB) and \
            os.path.getmtime(_LIB) >= newest_src else _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.normalize_hwc_to_chw.argtypes = [u8p, f32p, i64, i64, f32p, f32p]
        lib.normalize_hwc_to_chw_f32.argtypes = [f32p, f32p, i64, i64, f32p, f32p]
        lib.extract_tiles_chw.argtypes = [f32p, f32p, i64, i64, i64, i64p,
                                          i64, i64, i64]
        if hasattr(lib, "decode_header"):
            i64pp = ctypes.POINTER(ctypes.c_int64)
            for fname in ("decode_header", "decode_rgb", "decode_gray"):
                fn = getattr(lib, fname)
                fn.argtypes = ([u8p, i64, i64pp, i64pp] if fname ==
                               "decode_header" else [u8p, i64, u8p, i64pp, i64pp])
                fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalize_hwc_to_chw(img: np.ndarray, mean: np.ndarray,
                         std: np.ndarray) -> np.ndarray:
    """HWC uint8/float32 -> normalised CHW float32 (OpenMP, numpy fallback)."""
    lib = get_lib()
    h, w = img.shape[:2]
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    if lib is None or img.shape[2] != 3:
        x = (img.astype(np.float32) - mean) / np.asarray(std, np.float32)
        return np.ascontiguousarray(x.transpose(2, 0, 1))
    out = np.empty((3, h, w), np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.normalize_hwc_to_chw(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(out),
            h, w, _fptr(mean), _fptr(inv_std))
    else:
        src = np.ascontiguousarray(img, np.float32)
        lib.normalize_hwc_to_chw_f32(_fptr(src), _fptr(out), h, w,
                                     _fptr(mean), _fptr(inv_std))
    return out


def extract_tiles_chw(img: np.ndarray, coords) -> np.ndarray:
    """img [C, H, W] fp32 + [(y1,x1,y2,x2)] -> [T, C, th, tw] (numpy fallback)."""
    coords = np.ascontiguousarray(np.asarray(coords, np.int64))
    t = coords.shape[0]
    th = int(coords[0, 2] - coords[0, 0])
    tw = int(coords[0, 3] - coords[0, 1])
    lib = get_lib()
    if lib is None:
        return np.stack([img[:, y1:y2, x1:x2] for y1, x1, y2, x2 in coords])
    c, h, w = img.shape
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty((t, c, th, tw), np.float32)
    lib.extract_tiles_chw(_fptr(img), _fptr(out), c, h, w,
                          coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                          t, th, tw)
    return out


def decode_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "decode_header")


def _u8ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _decode(data: bytes, gray: bool):
    """bytes -> [H, W(, 3)] uint8, or None (caller falls back to PIL)."""
    if os.environ.get("RS_OV_NATIVE_DECODE", "1") == "0":  # kill-switch
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "decode_header"):
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    if lib.decode_header(_u8ptr(buf), buf.size,
                         ctypes.byref(h), ctypes.byref(w)) < 0:
        return None
    shape = (h.value, w.value) if gray else (h.value, w.value, 3)
    out = np.empty(shape, np.uint8)
    fn = lib.decode_gray if gray else lib.decode_rgb
    if fn(_u8ptr(buf), buf.size, _u8ptr(out),
          ctypes.byref(h), ctypes.byref(w)) != 0:
        return None  # -2: 16-bit / exotic color type -> PIL path
    return out


def decode_rgb(data: bytes):
    """Encoded PNG/JPEG bytes -> [H, W, 3] uint8 RGB, or None for the PIL
    fallback (unknown format, 16-bit PNG, decode error)."""
    return _decode(data, gray=False)


def decode_gray(data: bytes):
    """Encoded PNG/JPEG bytes -> [H, W] uint8 labels (palette PNGs keep raw
    indices, RGB-coded labels collapse to channel 0 — the PIL-path label
    semantics), or None for the PIL fallback."""
    return _decode(data, gray=True)
