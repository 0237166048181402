"""Measure forward AND backward gradient throughput of the production
queue-driven custom-VJP route (diff.queued_vjp.render_grad_fb) on the real
chip, final scene — the committed evidence for the verdict's "backward
>= 20 Mray/s" ask (r4 recorded 0.07 through the pixel-pinned route).
Writes docs/GRAD_BENCH.json.

Mray/s counts traced path SEGMENTS of the recording forward (same unit as
bench.py); backward divides the same segment count by (value+grad time -
forward time).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from path_tracer_tpu.diff import params as P
from path_tracer_tpu.diff.queued_vjp import (rec_segments,
                                             record_forward_q,
                                             render_grad_fb)
from path_tracer_tpu.scene.presets import build_final_scene

W, H = 400, 300
SPP = 4
DEPTH = 50


def main():
    scene, cam = build_final_scene(W / H)
    npx = W * H
    f = render_grad_fb(W, H, npx, SPP, max_depth=DEPTH, attenuate=True)
    cfg = {k: v for k, v in f.cfg.items()}

    sc_p, sc_s = P.partition(scene)
    cm_p, cm_s = P.partition(cam)
    zero = jnp.float32(0.0)

    def loss(sp, cp):
        fbm = f(P.combine(sp, sc_s), P.combine(cp, cm_s), zero, zero)
        return jnp.mean(fbm)

    fwd = jax.jit(loss)
    vgrad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    # segment count + queue-drain check from the recorder itself
    rcfg = {k: cfg[k] for k in ("npx", "spp", "max_depth", "attenuate",
                                "t_min", "seed", "rows", "rows_b",
                                "tile_rows", "tile_rows_b", "window", "chunk",
                                "n_windows", "n_windows_b", "interpret")}
    _, rec, ok = record_forward_q(scene, cam, W, H, zero, zero, **rcfg)
    segs = float(rec_segments(rec))
    assert bool(ok), "recording queue did not drain: raise avg_path_hint"

    def timeit(fn, *a, reps=3):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*a))
        return (time.perf_counter() - t0) / reps

    t_fwd = timeit(fwd, sc_p, cm_p)
    t_both = timeit(vgrad, sc_p, cm_p)
    t_bwd = max(t_both - t_fwd, 1e-9)

    rec = {
        "config": {"width": W, "height": H, "spp": SPP, "depth": DEPTH,
                   "scene": "final", "backend": jax.default_backend(),
                   "route": "queued_vjp", "rows": cfg["rows"],
                   "steps": cfg["n_windows"] * cfg["window"],
                   "steps_b": cfg["n_windows_b"] * cfg["window"],
                   "rows_b": cfg["rows_b"]},
        "segments": segs,
        "queue_drained": bool(ok),
        "forward_s": round(t_fwd, 4),
        "value_and_grad_s": round(t_both, 4),
        "forward_mray_s": round(segs / t_fwd / 1e6, 3),
        "backward_mray_s": round(segs / t_bwd / 1e6, 3),
        "grad_step_mray_s": round(segs / t_both / 1e6, 3),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "GRAD_BENCH.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
