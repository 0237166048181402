"""ctypes bindings for the native C++ host runtime (see ``native/`` at the
repo root: PNG encoder, scene packer).  Degrades gracefully when the shared
library has not been built — callers fall back to NumPy/PIL paths.

Build with ``make -C native`` (produces ``native/libptruntime.so``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libptruntime.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pt_write_png.restype = ctypes.c_int
        lib.pt_write_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def write_png(path: str, pixels_u8: np.ndarray) -> None:
    """pixels_u8: (H, W, 3) uint8, rows top-down."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    arr = np.ascontiguousarray(pixels_u8, np.uint8)
    h, w, _ = arr.shape
    rc = lib.pt_write_png(path.encode(), arr.ctypes.data, w, h)
    if rc != 0:
        raise RuntimeError(f"pt_write_png failed with code {rc}")
