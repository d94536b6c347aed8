"""ctypes binding for the native C++ batch loader (native/le_loader.cc).

Builds the shared library on first use (g++ + libjpeg, both in the image)
and exposes ``load_augment_batch`` — the fused decode→resize→crop→flip→
normalize pass. ``available()`` gates callers so the cv2 python pipeline
remains the fallback."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "lible_loader.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

__all__ = ["available", "load_augment_batch", "resize_bilinear"]


def _build(force: bool = False) -> bool:
    try:
        cmd = ["make"] + (["-B"] if force else []) + \
            ["-C", os.path.abspath(_NATIVE_DIR)]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.le_version() < 2:
                # Stale v1 .so on disk. Rebuilding helps the NEXT process
                # only: dlopen dedups by path and ctypes never dlcloses, so
                # re-CDLL-ing here would return the same stale handle. Fall
                # back to the python/cv2 pipeline for this process.
                _build(force=True)
                return None
        except (OSError, AttributeError):
            return None
        try:
            lib.le_load_augment_batch.restype = ctypes.c_int
            lib.le_load_augment_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
            lib.le_load_augment_batch_u8.restype = ctypes.c_int
            lib.le_load_augment_batch_u8.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ]
            lib.le_resize_bilinear.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.c_int,
            ]
        except AttributeError:   # any symbol missing: treat as unavailable
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_augment_batch(paths: Sequence[str], size: int, *, pad: int = 64,
                       train: bool = True, grayscale: bool = False,
                       seed: int = 0,
                       out_dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """(batch (N, S, S, C), status (N,) int32 — 0 = ok).

    out_dtype float32 → [0,1]-normalized; uint8 → raw pixels (the
    TPU-first transfer format: 4x less host→device bandwidth, the /255
    runs on device and fuses into the first conv)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    n = len(paths)
    c = 1 if grayscale else 3
    u8 = np.dtype(out_dtype) == np.uint8
    out = np.empty((n, size, size, c), np.uint8 if u8 else np.float32)
    status = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fn = lib.le_load_augment_batch_u8 if u8 else lib.le_load_augment_batch
    fn(arr, n, size, pad, int(train), int(grayscale),
       ctypes.c_uint64(seed),
       out.ctypes.data_as(ctypes.POINTER(
           ctypes.c_uint8 if u8 else ctypes.c_float)),
       status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.uint8)
    lib.le_resize_bilinear(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow)
    return out
