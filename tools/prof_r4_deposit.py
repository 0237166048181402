"""Round-4: hunt the gather+deposit superadditivity (prof_r4_bench.py:
gather alone +3.6 ms/fwe-bounce, deposit alone +1.5, together +14.7).

Hypothesis: the deposit's reshape(-1)+concat forces relayouts of the acc /
bank arrays that fight the g2d gather's vector layout every bounce.  Try a
deposit that keeps 2D (rows, LANE*6) indices end-to-end.

Runs the REAL wq_window_fb loop with a monkeypatched deposit.
"""
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
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_variant(name, scene, cam):
    @jax.jit
    def run(scene, cam, seed):
        return WQ.wq_window_fb(
            scene, cam, W, H, n_pix_loc=W * H, spp_loc=SPP,
            chunk=WQ.pick_chunk(SPP), window=WQ.DEF_WINDOW,
            max_depth=DEPTH, attenuate=False, t_min=1e-3,
            tile_rows=WQ.DEF_TILE_ROWS, interpret=False, seed=seed)
    seed = jnp.uint32(0)
    s = timeit(run, scene, cam, seed)
    fb, segs, iters, lane_steps = run(scene, cam, seed)
    segs = float(segs)
    fwe = float(lane_steps) / 483328.0
    print(f"{name:>10}: {s*1e3:8.1f} ms  {segs/s/1e6:6.2f} Mray/s  "
        f"ms/fwe={s*1e3/fwe:.2f}  fbsum={float(jnp.sum(fb)):.1f}",
        flush=True)


def main():
    scene, cam = build_final_scene(W / H)

    run_variant("baseline", scene, cam)

    # --- variant: 2D deposit (indices stay (rows, 6*LANE)) ----------------
    orig_fb0_len = None

    def make_patch():
        import functools
        f32 = jnp.float32

        def wq_window_fb_2d(*args, **kw):
            return WQ.wq_window_fb(*args, **kw)
        return wq_window_fb_2d

    # monkeypatch: redefine deposit inside wq by swapping module functions
    # is invasive; instead patch the two jnp calls wq uses via a copy of the
    # closure is impractical.  So: temporarily patch jnp reshape path by
    # giving WQ a flag.  Simplest honest approach: edit-in-place trial is
    # done in the engine under a keyword; see wq_window_fb(deposit_mode=).
    for mode in ("2d", "2dsep"):
        if not hasattr(WQ, "DEPOSIT_MODE"):
            print("engine lacks DEPOSIT_MODE knob; skipping", mode)
            return
        WQ.DEPOSIT_MODE = mode
        run_variant(mode, scene, cam)
    WQ.DEPOSIT_MODE = "flat"


if __name__ == "__main__":
    main()
