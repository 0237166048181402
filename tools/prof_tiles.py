"""Sweep tile_rows for the wave_bounce kernel (kernel-only chain slope)."""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE

W, H = 800, 600
scene, cam = build_final_scene(W / H)
n_pix = W * H
tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))

f32 = jnp.float32


def bench_tile(tile_rows):
    lanes = _round_up(int(n_pix * 1.25), tile_rows * LANE)
    rows = lanes // LANE
    sh = (rows, LANE)
    lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
    pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
    send = jnp.where(lane_ids < n_pix, f32(80), 0.0)
    st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send,
                      jnp.ones(sh, f32))
    step0 = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                              attenuate=False, tile_rows=tile_rows,
                              interpret=False)

    def chain(n):
        @jax.jit
        def f(st):
            out = step0(tables, st)
            def body(i, out):
                z = jnp.zeros(sh, jnp.uint32)
                return step0(tables, out.state, out, z)
            return jax.lax.fori_loop(0, n, body, out).state.ox
        return f

    def run(fn, *a):
        for _ in range(1):
            jax.block_until_ready(fn(*a))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    t2 = run(chain(2), st0)
    t12 = run(chain(12), st0)
    per = (t12 - t2) / 10
    print(f"tile_rows={tile_rows:4d}: {per*1e3:7.2f} ms/step  "
          f"{lanes/per/1e6:7.1f} Mlane/s  (lanes={lanes})", flush=True)


for tr in (16, 32, 64, 128, 256):
    try:
        bench_tile(tr)
    except Exception as e:
        print(f"tile_rows={tr}: FAILED {type(e).__name__}", flush=True)
