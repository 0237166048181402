"""One-config-per-process (window, chunk, spp) sweep of the production
windowed driver at the bench scene — run under a bash loop so a TPU/tunnel
fault in one config doesn't kill the rest.  ENV: SPP, CHUNK, WIN, TILE_ROWS.
"""
import os
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine.wq import _render_wqw_jit, _round_up
from path_tracer_tpu.scene.presets import build_final_scene

W, H, DEPTH = 800, 600, 50
SPP = int(os.environ.get("SPP", "80"))
C = int(os.environ.get("CHUNK", "10"))
WIN = int(os.environ.get("WIN", "16"))
TILE_ROWS = int(os.environ.get("TILE_ROWS", "32"))


def main():
    scene, cam = build_final_scene(W / H)
    lanes = _round_up(min(W * H, W * H * SPP), TILE_ROWS * 128)

    def run():
        img, segs, iters, _ls = _render_wqw_jit(
            scene, cam, W, H, SPP, DEPTH, False, 1e-3, TILE_ROWS, False,
            WIN, C, jnp.uint32(0))
        jax.block_until_ready(img)
        return img, float(segs), int(iters)

    img, segs, iters = run()
    t0 = time.perf_counter()
    img, segs, iters = run()
    dt = time.perf_counter() - t0
    print(f"spp={SPP:>3} C={C:>2} win={WIN:>2} rows={TILE_ROWS}: "
          f"{segs / dt / 1e6:6.2f} Mray/s  occ={segs / (iters * lanes):.3f}  "
          f"iters={iters}  {dt / iters * 1e3:5.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
