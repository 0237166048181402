"""Compare the TPU build's parity renderer against the ACTUAL reference
binary's output (built by run_reference.py from the unmodified sources in
/root/reference).

Both sides use the same per-pixel RNG streams — the reference seeds each
pixel's xorshift32 with std::hash<size_t>(linear_id) == linear_id
(render.hpp:130-131, identity hash in libstdc++), which is exactly
core.rng.seed_parity — and the same draw order, so images should agree
pixel-for-pixel up to float-op reassociation.  Reassociation noise can flip
a chaotic branch (dielectric Schlick threshold, smoke event) and change one
whole path, so agreement is reported as the fraction of pixels within 1/255
in sRGB, plus mean/p99/max linear error.

Usage: python tools/ref_parity/compare.py [W H] [--spp N]
(the reference binary always renders 100 spp / depth 50 — main.cpp:186,
render.hpp:144 — so --spp only subsamples OUR side for quick looks; the
committed parity numbers use the full 100.)
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def metrics(img_bottom_up: np.ndarray, ref_top_down: np.ndarray) -> dict:
    """Parity metrics between OUR linear render (fb row 0 = image bottom)
    and the reference's linear golden (row 0 = image top).  Quantizes our
    side exactly like the reference writer (main.cpp:44-49: byte =
    int(256*clamp(sqrt(c), 0, .999))) before differencing."""
    img = img_bottom_up[::-1]
    b = (256.0 * np.clip(np.sqrt(np.maximum(img, 0.0)), 0.0, 0.999)).astype(
        np.int32)
    ours_lin = (b.astype(np.float64) / 256.0) ** 2
    err = np.abs(ours_lin - ref_top_down)
    byte_ref = (256.0 * np.clip(np.sqrt(ref_top_down), 0.0, 0.999)).astype(
        np.int32)
    byte_diff = np.abs(b - byte_ref).max(axis=-1)  # per-pixel max channel
    return {
        "pct_pixels_byte_exact": round(float((byte_diff == 0).mean()) * 100,
                                       3),
        "pct_pixels_within_1_255": round(
            float((byte_diff <= 1).mean()) * 100, 3),
        "pct_pixels_within_4_255": round(
            float((byte_diff <= 4).mean()) * 100, 3),
        "mean_abs_linear_err": float(err.mean()),
        "p99_abs_linear_err": float(np.percentile(err, 99)),
        "max_abs_linear_err": float(err.max()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("width", type=int, nargs="?", default=80)
    ap.add_argument("height", type=int, nargs="?", default=48)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--golden-dir", default="/tmp/ref_parity")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()
    w, h = args.width, args.height

    golden_npy = pathlib.Path(args.golden_dir) / f"ref_{w}x{h}.npy"
    if not golden_npy.exists():
        from tools.ref_parity.run_reference import run
        run(w, h, args.golden_dir)
    ref = np.load(golden_npy)  # (h, w, 3) linear, row 0 = image TOP

    from path_tracer_tpu.engine.integrator import render_parity
    from path_tracer_tpu.scene.presets import build_final_scene

    scene, cam = build_final_scene(w / h)
    # band the parity render (full-frame jnp folds OOM a v5e at 800x480)
    band = 32 if w * h > 64 * 64 else 0
    img = np.asarray(render_parity(scene, cam, w, h, args.spp, max_depth=50,
                                   band_rows=band))
    report = {"config": {"width": w, "height": h, "spp": args.spp,
                         "ref_spp": 100, "depth": 50}}
    report.update(metrics(img, ref))
    print(json.dumps(report, indent=2))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
