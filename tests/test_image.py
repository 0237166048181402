"""Tone mapping + PNG output tests (main.cpp:16-59 semantics), incl. the
native C++ writer when built."""
import os
import subprocess
import sys

import numpy as np
import pytest

from path_tracer_tpu.utils import image as im


def test_tonemap_gamma_clamp_flip():
    fb = np.zeros((2, 3, 3), np.float32)
    fb[0, 0] = [0.25, 1.0, 4.0]     # sqrt -> .5, 1.0, 2.0; clamp .999
    fb[1, 2] = [0.0, 0.01, 1.0]
    out = im.tonemap(fb)
    assert out.dtype == np.uint8
    # vertical flip: fb row 0 (bottom) becomes output row 1 (bottom)
    assert list(out[1, 0]) == [int(256 * 0.5), int(256 * 0.999),
                               int(256 * 0.999)]
    assert list(out[0, 2]) == [0, int(256 * 0.1), int(256 * 0.999)]


def test_ppm_header():
    fb = np.full((2, 2, 3), 0.25, np.float32)
    txt = im.dump_ppm(fb)
    lines = txt.splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "2 2"
    assert lines[2] == "255"
    assert len(lines) == 3 + 4


def test_save_png_roundtrip(tmp_path):
    fb = np.random.RandomState(0).uniform(0, 1, (8, 10, 3)).astype(np.float32)
    path = str(tmp_path / "out.png")
    im.save_png(path, fb)
    from PIL import Image
    back = np.asarray(Image.open(path))
    assert back.shape == (8, 10, 3)
    np.testing.assert_array_equal(back, im.tonemap(fb))


def test_native_runtime_if_built(tmp_path):
    from path_tracer_tpu.native import runtime as rt
    if not rt.available():
        pytest.skip("native runtime not built (make -C native)")
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    path = str(tmp_path / "n.png")
    rt.write_png(path, img)
    from PIL import Image
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)


def test_native_tonemap_matches_numpy(tmp_path):
    """C++ pt_tonemap / pt_save_framebuffer_png agree bit-for-bit with the
    NumPy reference tonemap (main.cpp:41-49 semantics)."""
    from path_tracer_tpu.native import runtime as rt
    if not rt.available():
        pytest.skip("native runtime not built (make -C native)")
    fb = np.random.RandomState(1).uniform(0, 1.4, (9, 7, 3)).astype(
        np.float32)
    np.testing.assert_array_equal(rt.tonemap(fb), im.tonemap(fb))
    path = str(tmp_path / "fb.png")
    rt.save_framebuffer_png(path, fb)
    from PIL import Image
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, im.tonemap(fb))
