"""Round-4 accounting: time the REAL production render (wq_window_fb, the
exact bench path) end-to-end with stages ablated, so every ms of the
22 Mray/s bench is named (VERDICT r3 weak #1: measured ~19.9 ms per
full-width-equivalent bounce vs ~9.3 accounted).

Also times sphere_fold (the broadcast-layout ancestor kernel) at bench lane
count to validate the claimed fold-layout win before porting it into
bounce_core.
"""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def full_render(ablate: frozenset):
    @jax.jit
    def run(scene, cam, seed):
        fb, segs, iters, lane_steps = WQ.wq_window_fb(
            scene, cam, W, H, n_pix_loc=W * H, spp_loc=SPP,
            chunk=WQ.pick_chunk(SPP), window=WQ.DEF_WINDOW,
            max_depth=DEPTH, attenuate=False, t_min=1e-3,
            tile_rows=WQ.DEF_TILE_ROWS, interpret=False, seed=seed,
            _ablate=ablate)
        return fb, segs, iters, lane_steps
    return run


def main():
    scene, cam = build_final_scene(W / H)
    seed = jnp.uint32(0)

    base = None
    # NOTE: "refill" cannot be ablated in the real loop (the counter would
    # never advance); "camera" ablates just the camera-ray math inside it.
    for name, ab in [
        ("full", frozenset()),
        ("nogather", frozenset({"gather"})),
        ("nodeposit", frozenset({"deposit"})),
        ("nocamera", frozenset({"camera"})),
        ("allglue", frozenset({"gather", "deposit", "camera"})),
    ]:
        fn = full_render(ab)
        s = timeit(fn, scene, cam, seed)
        fb, segs, iters, lane_steps = fn(scene, cam, seed)
        segs = float(segs); iters = int(iters); ls = float(lane_steps)
        mray = segs / s / 1e6
        fwe = ls / 483328.0          # full-width-equivalent bounces
        if base is None:
            base = s
        print(f"{name:>14}: {s*1e3:8.1f} ms  {mray:6.2f} Mray/s  "
              f"iters={iters} fwe_bounces={fwe:.1f} "
              f"ms/fwe={s*1e3/fwe:.2f}", flush=True)


if __name__ == "__main__":
    main()
