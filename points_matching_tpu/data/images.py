"""Host-side image loading feeding device buffers (implicit component N7:
``cv::imread`` replacement; demo call site ``Points Matching/main.cpp:14-15``).

Decode order: the native C++ decoder (BMP/PPM/PGM, built from
``native/decode.cpp`` — same split as the reference, where decoding lives in
native OpenCV code) → PIL fallback for JPEG/PNG.  Output is float32
grayscale in [0, 255] (the value scale the reference's 8-bit pipeline and
its Hessian threshold assume) as a host numpy array; callers ``device_put``
it once per frame.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_NATIVE = None


def _load_native():
    """Load the C++ decoder shared library if it has been built."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "native", "build", "libpmtpu_native.so")
    if not os.path.exists(so):
        _NATIVE = False
        return False
    lib = ctypes.CDLL(so)
    lib.pmtpu_decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.pmtpu_decode_image.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.pmtpu_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
    _NATIVE = lib
    return lib


def _native_decode(path: str) -> Optional[np.ndarray]:
    lib = _load_native()
    if not lib:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    buf = lib.pmtpu_decode_image(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if not buf:
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    lib.pmtpu_free(buf)
    return arr.reshape(h.value, w.value, c.value)


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma (identical weights to OpenCV's cvtColor)."""
    if rgb.ndim == 2:
        return rgb.astype(np.float32)
    if rgb.shape[-1] == 1:
        return rgb[..., 0].astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b).astype(np.float32)


def load_image(path: str, grayscale: bool = True) -> np.ndarray:
    """Decode an image file.

    Returns float32 [H, W] (grayscale, values 0-255) or uint8 [H, W, C].
    """
    arr = _native_decode(path)
    if arr is None:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"))
    if grayscale:
        return rgb_to_gray(arr)
    return arr


def load_pair(path1: str, path2: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load the two demo images (reference ``main.cpp:14-15``)."""
    return load_image(path1), load_image(path2)
