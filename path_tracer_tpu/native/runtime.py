"""ctypes bindings for the native C++ host runtime (see ``native/`` at the
repo root: framebuffer tonemap + PNG encoder, the TPU build's equivalent of
the reference's native host pipeline, main.cpp:16-59).  Degrades gracefully
when the shared library has not been built — callers fall back to
NumPy/PIL paths.

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
        lib.pt_tonemap.restype = None
        lib.pt_tonemap.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.pt_save_framebuffer_png.restype = ctypes.c_int
        lib.pt_save_framebuffer_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _LIB = lib
    except (OSError, AttributeError):
        # AttributeError: a stale libptruntime.so built before newer
        # symbols (pt_tonemap/pt_save_framebuffer_png) were added —
        # degrade to the NumPy/PIL path rather than crash available().
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


def tonemap(fb_f32: np.ndarray) -> np.ndarray:
    """Native tonemap: (H, W, 3) linear f32 row 0 = image bottom ->
    (H, W, 3) uint8 rows top-down (main.cpp:41-49 semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    arr = np.ascontiguousarray(fb_f32, np.float32)
    h, w, _ = arr.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.pt_tonemap(arr.ctypes.data, w, h, out.ctypes.data)
    return out


def save_framebuffer_png(path: str, fb_f32: np.ndarray) -> None:
    """Tonemap + encode + write in one native call."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    arr = np.ascontiguousarray(fb_f32, np.float32)
    h, w, _ = arr.shape
    rc = lib.pt_save_framebuffer_png(path.encode(), arr.ctypes.data, w, h)
    if rc != 0:
        raise RuntimeError(f"pt_save_framebuffer_png failed with code {rc}")
