"""Ablation profile of the PRODUCTION windowed driver (engine.wq.wq_window_fb
itself, via its _ablate hook) at the bench config — unlike prof_r3_wqw.py,
which re-implements the body and (it turned out) mismeasured the deposit and
omitted the camera-ray refill.  Reports ms per bounce-iter for each ablation.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.scene.presets import build_final_scene

W, H, DEPTH = 800, 600, 50
SPP = int(os.environ.get("SPP", "80"))
C = int(os.environ.get("CHUNK", "10"))
WIN = int(os.environ.get("WIN", "16"))
TILE_ROWS = int(os.environ.get("TILE_ROWS", "32"))


def run_one(scene, cam, ablate):
    @jax.jit
    def go(seed):
        fb, segs, iters, _lane_steps = WQ.wq_window_fb(
            scene, cam, W, H, n_pix_loc=W * H, spp_loc=SPP, chunk=C,
            window=WIN, max_depth=DEPTH, attenuate=False, t_min=1e-3,
            tile_rows=TILE_ROWS, interpret=False, seed=seed,
            _ablate=frozenset(ablate))
        return fb, segs, iters

    seed = jnp.uint32(0)
    fb, segs, iters = go(seed)          # compile + warmup
    jax.block_until_ready(fb)
    t0 = time.perf_counter()
    fb, segs, iters = go(seed)
    jax.block_until_ready(fb)
    dt = time.perf_counter() - t0
    it = int(iters)
    sg = float(segs)
    lanes = WQ._round_up(min(W * H, W * H * SPP), TILE_ROWS * 128)
    print(f"[spp={SPP} C={C} win={WIN}] "
          f"{'+'.join(sorted(ablate)) or 'full':>28}: {dt:6.2f} s  "
          f"iters={it}  {dt / it * 1e3:6.2f} ms/iter  "
          f"occ={sg / (it * lanes):.3f}  "
          f"{sg / dt / 1e6:6.2f} Mray/s", flush=True)


def main():
    scene, cam = build_final_scene(W / H)
    configs = [
        (),
        ("gather",),
        ("deposit",),
        ("camera",),
        ("camera", "gather", "deposit"),
        ("refill", "gather", "deposit"),
    ]
    want = sys.argv[1:]
    if want:
        configs = [tuple(w.split("+")) if w != "full" else () for w in want]
    for ab in configs:
        run_one(scene, cam, ab)


if __name__ == "__main__":
    main()
