"""Scaling harness: forward Mray/s and train-step time at 1 vs N devices,
with parallel efficiency, written to SCALING.json (SURVEY.md §5.8; the
BASELINE scaling target is >=90% linear to 2 hosts).

On this machine the mesh is virtual (8 CPU devices via
--xla_force_host_platform_device_count); virtual devices share one socket,
so wall-clock "efficiency" there measures sharding overhead (collective
glue, padding waste), not real speedup — the number that transfers to real
slices is the overhead fraction, reported separately.  On a real multi-chip
slice the same script reports true scaling.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling.py [--out SCALING.json]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    from path_tracer_tpu.parallel.mesh import (make_mesh, make_train_step,
                                               render_sharded,
                                               scene_camera_params)
    from path_tracer_tpu.scene.presets import build_final_scene

    n_dev = len(jax.devices())
    backend = jax.default_backend()
    w, h, spp, depth = args.width, args.height, args.spp, args.depth
    scene, cam = build_final_scene(w / h)
    samples = w * h * spp

    results = {"backend": backend, "devices": n_dev,
               "config": {"width": w, "height": h, "spp": spp,
                          "depth": depth, "scene": "final"},
               "points": []}

    sizes = sorted({1, 2, n_dev // 2, n_dev} - {0})
    for n in sizes:
        if n > n_dev:
            continue
        n_spp = 2 if n >= 4 and n % 2 == 0 else 1
        mesh = make_mesh(n_tiles=n // n_spp, n_spp=n_spp,
                         devices=jax.devices()[:n])

        # forward: the production wq megakernel under shard_map
        fwd = lambda: render_sharded(scene, cam, w, h, spp, mesh,
                                     max_depth=depth, renderer="wq")
        t_fwd = timeit(fwd)

        # train step: distributed grad with psum all-reduce
        params, static = scene_camera_params(scene, cam)
        step = make_train_step(static[0], static[1], w, h,
                               max(spp // n_spp, 1), depth, mesh)
        target = jnp.zeros((w * h, 3), jnp.float32)
        pix_ids = jnp.arange(w * h, dtype=jnp.uint32)

        def train():
            p2, loss = step(params, target, pix_ids)
            return loss
        t_train = timeit(train)

        results["points"].append({
            "devices": n, "mesh": [n // n_spp, n_spp],
            "forward_s": round(t_fwd, 4),
            "forward_msamples_s": round(samples / t_fwd / 1e6, 3),
            "train_step_s": round(t_train, 4),
        })
        print(f"n={n}: forward {t_fwd*1e3:.1f} ms "
              f"({samples/t_fwd/1e6:.2f} Msamples/s), "
              f"train {t_train*1e3:.1f} ms", flush=True)

    base = results["points"][0]
    for p in results["points"]:
        ideal = base["forward_s"] * base["devices"] / p["devices"]
        p["parallel_efficiency_fwd"] = round(ideal / p["forward_s"], 3)
        ideal_t = base["train_step_s"] * base["devices"] / p["devices"]
        p["parallel_efficiency_train"] = round(ideal_t / p["train_step_s"],
                                               3)

    pathlib.Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results["points"][-1]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
