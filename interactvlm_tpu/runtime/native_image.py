"""ctypes binding for the native C++ image decoder (``native/ivlm_io.cpp``).

Builds the shared library on demand (g++, libpng/libjpeg) and exposes
decode + fused SAM preprocess. ctypes calls release the GIL, so the thread
pool in ``runtime/prefetch.py`` scales across cores. Falls back to the
pure-Python transforms when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libivlm_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(os.path.join(_NATIVE_DIR, "ivlm_io.cpp")):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ivlm_image_size.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.ivlm_decode_rgb.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.ivlm_sam_preprocess.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_rgb(path: str) -> np.ndarray:
    """Decode PNG/JPEG to RGB uint8 (H, W, 3) via the native decoder."""
    lib = _load()
    if lib is None:
        from interactvlm_tpu.data.transforms import load_image_rgb

        return load_image_rgb(path)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ivlm_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ivlm_decode_rgb(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), h, w
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def sam_preprocess_native(path: str, target: int = 1024):
    """Fused decode + longest-side resize + normalize + pad.

    Returns (tensor (target, target, 3) float32, (resized_h, resized_w)).
    """
    lib = _load()
    if lib is None:
        from interactvlm_tpu.data.transforms import (
            load_image_rgb,
            sam_preprocess,
        )

        return sam_preprocess(load_image_rgb(path), target)
    from interactvlm_tpu.utils.constants import (
        SAM_MEAN_PIXEL,
        SAM_STD_PIXEL,
    )

    mean = np.asarray(SAM_MEAN_PIXEL, np.float32)
    std = np.asarray(SAM_STD_PIXEL, np.float32)
    out = np.empty((target, target, 3), np.float32)
    rh = ctypes.c_int()
    rw = ctypes.c_int()
    rc = lib.ivlm_sam_preprocess(
        path.encode(), target,
        mean.ctypes.data_as(ctypes.c_void_p),
        std.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(rh), ctypes.byref(rw),
    )
    if rc != 0:
        raise IOError(f"native preprocess failed ({rc}): {path}")
    return out, (rh.value, rw.value)
