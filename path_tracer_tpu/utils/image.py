"""Image output matching the reference's tone mapping and file writing
(``/root/reference/src/main.cpp:16-59``): gamma 2.0 via sqrt, clamp to
[0, 0.999], scale by 256, truncate to int, and flip vertically (the fb is
y-up, PNG rows are top-down).

PNG encoding prefers the native C++ writer (see ``native/``) and falls back
to PIL.  A PPM dump mirroring dump_image_ppm (main.cpp:17-31) is included.
"""
from __future__ import annotations

import io
from typing import Union

import numpy as np


def tonemap(fb: np.ndarray) -> np.ndarray:
    """(H, W, 3) linear f32, y-up -> (H, W, 3) uint8, y-down."""
    fb = np.asarray(fb, np.float32)
    v = np.sqrt(fb)                       # gamma 2.0 (main.cpp:44-49)
    v = np.clip(v, 0.0, 0.999)
    pix = (256.0 * v).astype(np.int32).astype(np.uint8)
    return pix[::-1]                      # flip y (main.cpp:41)


def save_png(path: str, fb: np.ndarray) -> None:
    try:
        from ..native import runtime as native_rt
        if native_rt.available():
            # one native call: tonemap + PNG encode + write
            native_rt.save_framebuffer_png(path, np.asarray(fb, np.float32))
            return
    except Exception:
        pass
    from PIL import Image
    Image.fromarray(tonemap(fb), "RGB").save(path)


def dump_ppm(fb: np.ndarray) -> str:
    """P3 PPM text, rows top-down like dump_image_ppm (main.cpp:17-31)."""
    pix = tonemap(fb).astype(np.int32)
    h, w, _ = pix.shape
    out = io.StringIO()
    out.write(f"P3\n{w} {h}\n255\n")
    for row in pix.reshape(h * w, 3):
        out.write(f"{row[0]} {row[1]} {row[2]}\n")
    return out.getvalue()
