"""Command-line renderer — the app layer (reference: src/main.cpp:61-197).

Where the reference hard-codes one scene, one size (CMake-time), 100 spp and
depth 50, every knob here is a flag; the 5 staged preset scenes replace the
single built-in one.

    python -m path_tracer_tpu render --scene final_scene --spp 100 -o out.png
    python -m path_tracer_tpu render --scene cornell_box --renderer parity
    python -m path_tracer_tpu info
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="path_tracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a scene to PNG")
    r.add_argument("--scene", default="final_scene",
                   help="preset name (see `info`)")
    r.add_argument("--width", type=int, default=None)
    r.add_argument("--height", type=int, default=None)
    r.add_argument("--spp", type=int, default=None,
                   help="samples per pixel")
    r.add_argument("--max-depth", type=int, default=None,
                   help="bounce depth (reference: 50, render.hpp:144)")
    from .config import RENDERERS
    r.add_argument("--renderer", default="auto", choices=list(RENDERERS),
                   help="launch strategy: wq = windowed work-queue "
                        "megakernel (the TPU production path, auto default "
                        "on accelerators); wavefront = jnp bounce loop "
                        "(auto default on CPU); parity = reference RNG "
                        "streams")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--t-min", type=float, default=1e-3)
    r.add_argument("--attenuate-emission", action="store_true",
                   help="physically-correct emission instead of the "
                        "reference's unattenuated-return quirk")
    r.add_argument("-o", "--out", default="out.png")
    r.add_argument("--ppm", action="store_true",
                   help="also dump P3 PPM to stdout (main.cpp:17-31)")
    r.add_argument("--checkpoint-dir", default="",
                   help="save/resume partial sample accumulators here")
    r.add_argument("--checkpoint-every", type=int, default=50,
                   help="spp between checkpoints")
    r.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace here")
    r.add_argument("--metrics", action="store_true",
                   help="print a JSON metrics line when done")

    sub.add_parser("info", help="list presets, devices, build info")

    b = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    b.add_argument("--scene", default="final_scene")
    b.add_argument("--spp", type=int, default=None)
    return ap


def resolve_auto_renderer() -> str:
    """The single source of truth for what `--renderer auto` runs: the
    work-queue megakernel on accelerators (the path bench.py measures and
    BENCH_r*.json records), the jnp bounce loop on CPU (faster than
    interpret-mode pallas)."""
    import jax
    return "wq" if jax.default_backend() != "cpu" else "wavefront"


def _cmd_info() -> int:
    import jax
    from . import __version__
    from .native import runtime as native_rt
    from .scene.presets import PRESETS
    info = {
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "native_runtime": native_rt.available(),
        "presets": {
            name: {"width": p.width, "height": p.height, "spp": p.spp,
                   "depth": p.max_depth}
            for name, p in PRESETS.items()
        },
    }
    print(json.dumps(info, indent=2))
    return 0


def _cmd_render(args) -> int:
    import jax
    from .config import RenderConfig
    from .engine.checkpoint import render_checkpointed
    from .engine.integrator import (render_fused, render_parity, render_perf,
                                    render_wavefront)
    from .scene.presets import PRESETS
    from .utils import profiling
    from .utils.image import dump_ppm, save_png

    overrides = {k: v for k, v in dict(
        width=args.width, height=args.height, spp=args.spp,
        max_depth=args.max_depth).items() if v is not None}
    cfg = RenderConfig.for_preset(
        args.scene, renderer=args.renderer, seed=args.seed,
        t_min=args.t_min, attenuate_emission=args.attenuate_emission,
        out=args.out, ppm=args.ppm, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        profile_dir=args.profile_dir, **overrides)

    preset = PRESETS[cfg.scene]
    if cfg.scene == "final_scene":
        # the final scene's builder is aspect-parameterized (the camera
        # viewport follows the output size, main.cpp:171)
        from .scene.presets import build_final_scene
        scene, cam = build_final_scene(cfg.width / cfg.height)
    else:
        scene, cam = preset.build()
    timer = profiling.PhaseTimer()

    renderer = cfg.renderer
    if renderer == "auto":
        renderer = resolve_auto_renderer()

    segments = None
    with profiling.trace(cfg.profile_dir):
        with timer.phase("compile+render"):
            if cfg.checkpoint_dir:
                img = render_checkpointed(
                    scene, cam, cfg.width, cfg.height, cfg.spp,
                    cfg.max_depth, cfg.attenuate_emission, cfg.t_min,
                    cfg.seed, cfg.checkpoint_dir, cfg.checkpoint_every,
                    scene_name=cfg.scene)
            elif renderer == "wq":
                from .engine.wq import render_wq
                img, segments, _, _ = render_wq(
                    scene, cam, cfg.width, cfg.height, cfg.spp,
                    cfg.max_depth, cfg.attenuate_emission, cfg.t_min,
                    cfg.seed, return_stats=True)
            elif renderer == "wavefront":
                img, segments = render_wavefront(
                    scene, cam, cfg.width, cfg.height, cfg.spp,
                    cfg.max_depth, cfg.attenuate_emission, cfg.t_min,
                    cfg.seed, cfg.tile_pix, cfg.slots,
                    return_segments=True)
            elif renderer == "fused":
                img = render_fused(scene, cam, cfg.width, cfg.height,
                                   cfg.spp, cfg.max_depth,
                                   cfg.attenuate_emission, cfg.t_min,
                                   cfg.seed)
            elif renderer == "perf":
                img = render_perf(scene, cam, cfg.width, cfg.height,
                                  cfg.spp, cfg.max_depth,
                                  cfg.attenuate_emission, cfg.t_min,
                                  cfg.seed)
            else:
                img = render_parity(scene, cam, cfg.width, cfg.height,
                                    cfg.spp, cfg.max_depth,
                                    cfg.attenuate_emission, cfg.t_min)
            img = np.asarray(jax.block_until_ready(img))

    samples = cfg.width * cfg.height * cfg.spp
    timer.add_rays(float(segments) if segments is not None else 0.0,
                   samples)
    with timer.phase("write"):
        save_png(cfg.out, img)
        if cfg.ppm:
            sys.stdout.write(dump_ppm(img))
    profiling.log.info("wrote %s (%dx%d, %d spp, %s)", cfg.out, cfg.width,
                       cfg.height, cfg.spp, cfg.renderer)
    if args.metrics:
        print(json.dumps(timer.summary()))
    return 0


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "info":
        return _cmd_info()
    if args.cmd == "render":
        return _cmd_render(args)
    if args.cmd == "bench":
        # delegate to repo-root bench.py semantics: render the headline
        # config on the current backend and print one JSON line
        import jax
        from .scene.presets import PRESETS
        name = args.scene
        p = PRESETS[name]
        on_cpu = jax.default_backend() == "cpu"
        spp = args.spp or (2 if on_cpu else 40)
        scene, cam = p.build()
        # measure exactly what `--renderer auto` runs (and what repo-root
        # bench.py measures) so the three numbers are one story
        renderer = resolve_auto_renderer()
        if renderer == "wavefront":
            from .engine.integrator import render_wavefront as _render
            run = lambda: _render(scene, cam, p.width, p.height, spp,
                                  p.max_depth, return_segments=True)[1]
        else:
            from .engine.wq import render_wq
            run = lambda: render_wq(scene, cam, p.width, p.height, spp,
                                    p.max_depth, return_stats=True)[1]
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        segs = float(jax.block_until_ready(run()))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"forward Mray/s ({name})",
            "value": round(segs / dt / 1e6, 3),
            "unit": "Mray/s",
            "vs_baseline": round(segs / dt / 1e6 / 200.0, 4),
        }))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
