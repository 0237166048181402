"""Build and run the ACTUAL reference path tracer (/root/reference) on the
host, producing true golden images for parity testing.

The reference's default backend (triSYCL) is a header-only host library that
is not on this machine; tools/ref_parity/shim provides the ~200-line SYCL
subset the reference uses (SURVEY.md §1 L0) so the unmodified reference
sources compile with plain g++.  Kernel lambdas execute on the host exactly
as triSYCL would run them (FindTriSYCL.cmake:165 — OpenMP CPU execution),
with the same per-pixel RNG streams (render.hpp:130-131; libstdc++
std::hash<size_t> is the identity).

stb_image is likewise absent, so the images the scene loads
(main.cpp:133,145) are pre-decoded to .raw with PIL.  PIL's JPEG IDCT can
differ from stb's by +-1/255 per texel — a sub-quantization-step difference
confined to the two textured objects; noted in the parity report.

Usage:  python tools/ref_parity/run_reference.py [WIDTH HEIGHT [outdir]]
Writes: <outdir>/ref_<W>x<H>.png and .npy (linear [0,1] float, row 0 = image
TOP, like the reference's PNG; samples=100, depth=50 are the reference's
hard-coded values, main.cpp:186 / render.hpp:144).
"""
from __future__ import annotations

import pathlib
import shutil
import struct
import subprocess
import sys

import numpy as np
from PIL import Image

REF = pathlib.Path("/root/reference")
HERE = pathlib.Path(__file__).resolve().parent


def decode_images(workdir: pathlib.Path) -> None:
    img_dir = workdir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    for src in (REF / "images").iterdir():
        dst = img_dir / src.name
        shutil.copy(src, dst)
        im = Image.open(src).convert("RGB")
        arr = np.asarray(im, dtype=np.uint8)
        with open(str(dst) + ".raw", "wb") as f:
            f.write(b"PTRW")
            f.write(struct.pack("<ii", im.width, im.height))
            f.write(arr.tobytes())


def build(workdir: pathlib.Path, width: int, height: int) -> pathlib.Path:
    exe = workdir / f"sycl-rt-{width}x{height}"
    cmd = [
        "g++", "-O3", "-std=c++20", "-fopenmp", "-march=native",
        f"-I{HERE / 'shim'}", f"-I{HERE / 'shim' / 'sycl'}",
        f"-I{REF / 'include'}",
        f"-DOUTPUT_WIDTH={width}", f"-DOUTPUT_HEIGHT={height}",
        str(REF / "src" / "main.cpp"), "-o", str(exe),
    ]
    subprocess.run(cmd, check=True)
    return exe


def read_ptrw(path: pathlib.Path) -> np.ndarray:
    raw = path.read_bytes()
    assert raw[:4] == b"PTRW", "not a PTRW file"
    w, h = struct.unpack("<ii", raw[4:12])
    return np.frombuffer(raw[12:], dtype=np.uint8).reshape(h, w, 3)


def run(width: int = 800, height: int = 480,
        outdir: pathlib.Path | None = None) -> pathlib.Path:
    workdir = pathlib.Path("/tmp/ref_parity")
    rundir = workdir / "run"
    rundir.mkdir(parents=True, exist_ok=True)
    decode_images(workdir)
    exe = build(workdir, width, height)
    # texture paths are "../images/..." relative to cwd (main.cpp:133,145)
    subprocess.run([str(exe)], cwd=rundir, check=True)
    srgb = read_ptrw(rundir / "out.png")

    outdir = pathlib.Path(outdir) if outdir else workdir
    outdir.mkdir(parents=True, exist_ok=True)
    png = outdir / f"ref_{width}x{height}.png"
    Image.fromarray(srgb, "RGB").save(png)
    # undo the writer's gamma-2 encode (main.cpp:44-49: byte = 256*sqrt(c)
    # clamped) to linear for numeric comparison
    lin = (srgb.astype(np.float64) / 256.0) ** 2
    np.save(outdir / f"ref_{width}x{height}.npy", lin.astype(np.float32))
    print(f"golden: {png}")
    return png


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    out = sys.argv[3] if len(sys.argv) > 3 else None
    run(w, h, out)
