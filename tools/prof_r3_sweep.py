"""Sweep (chunk, window) of the windowed wq driver at bench config on the
real chip: Mray/s, occupancy, iters, derived ms/iter.  Decides DEF_WINDOW
and MAX_CHUNK."""
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine.wq import _render_wqw_jit
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50
LANES = 483328


def main():
    scene, cam = build_final_scene(W / H)
    for C, win in [(4, 8), (4, 16), (10, 8), (10, 16), (5, 10), (2, 8)]:
        if SPP % C:
            continue
        def run():
            img, segs, iters, _ls = _render_wqw_jit(
                scene, cam, W, H, SPP, DEPTH, False, 1e-3, 32, False,
                win, C, jnp.uint32(0))
            jax.block_until_ready(img)
            return img, float(segs), int(iters)
        img, segs, iters = run()
        t0 = time.perf_counter()
        img, segs, iters = run()
        dt = time.perf_counter() - t0
        print(f"C={C:>2} win={win:>2}: {segs/dt/1e6:6.2f} Mray/s  "
              f"occ={segs/(iters*LANES):.3f}  iters={iters}  "
              f"{dt/iters*1e3:5.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
