"""Benchmark: forward Mray/s per chip on the final smoke+lights scene at
800x600 (the BASELINE.json headline config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

"ray" counts traced path segments (one intersect+scatter of a live lane) —
the standard wavefront throughput unit; the JSON also carries camera
rays (samples) per second, the measured average path length, and the
work-queue occupancy (segments traced / lane-steps available) for context.
Baseline target: 200 Mray/s/chip.
"""
from __future__ import annotations

import json
import time

import jax

# The windowed megakernel program compiles in ~minutes through the remote
# TPU compile; a persistent compilation cache makes repeat bench runs
# (and the driver's) start in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from path_tracer_tpu.engine.wq import render_wq
    from path_tracer_tpu.scene.presets import build_final_scene

    width, height, depth = 800, 600, 50
    scene, cam = build_final_scene(width / height)

    backend = jax.default_backend()
    # Full 500spp takes minutes; throughput is linear in spp, so measure a
    # slice that runs in a few seconds and report rays/s.
    spp = 80 if backend != "cpu" else 2

    def run():
        img, segs, iters, lane_steps = render_wq(
            scene, cam, width, height, spp, max_depth=depth,
            return_stats=True)
        return (img, float(jax.block_until_ready(segs)), int(iters),
                float(lane_steps))

    img, segs, iters, lane_steps = run()  # warmup / compile

    t0 = time.perf_counter()
    img, segs, iters, lane_steps = run()
    dt = time.perf_counter() - t0

    samples = width * height * spp
    mray_s = segs / dt / 1e6
    print(json.dumps({
        "metric": "forward Mray/s/chip (traced segments), final scene "
                  "800x600 depth50",
        "value": round(mray_s, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / 200.0, 4),
        "camera_mray_s": round(samples / dt / 1e6, 3),
        "avg_path_len": round(segs / samples, 3),
        "occupancy": round(segs / lane_steps, 3),
        "wq_iters": iters,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
