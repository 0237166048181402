"""r5 gradient-route profiling on the real chip: split the backward cost
into (replay fb fwd | replay vjp) and sweep the static schedule.  Also
checks replay fb == recorded fb (the exactness invariant).  Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/prof_r5_grad.py \
      [rows] [hint] [max_steps] [rows_b] [max_steps_b] [unroll]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from path_tracer_tpu.diff import params as P
from path_tracer_tpu.diff.queued_vjp import (rec_segments,
                                             record_forward_q,
                                             render_grad_fb, replay_fb)
from path_tracer_tpu.scene.presets import build_final_scene

W, H = 400, 300
SPP = 4
DEPTH = 50


def timeit(fn, *a, reps=3):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / reps


def argn(i, cast=int):
    return cast(sys.argv[i]) if len(sys.argv) > i and sys.argv[i] != "-" \
        else None


def main():
    rows = argn(1)
    hint = argn(2, float) or 3.0
    max_steps = argn(3)
    rows_b = argn(4)
    max_steps_b = argn(5)
    unroll = argn(6) or 4
    scene, cam = build_final_scene(W / H)
    npx = W * H
    f = render_grad_fb(W, H, npx, SPP, max_depth=DEPTH, attenuate=True,
                       rows=rows, avg_path_hint=hint, max_steps=max_steps,
                       rows_b=rows_b, max_steps_b=max_steps_b)
    cfg = f.cfg
    rcfg = {k: cfg[k] for k in ("npx", "spp", "max_depth", "attenuate",
                                "t_min", "seed", "rows", "rows_b",
                                "tile_rows", "tile_rows_b", "window", "chunk",
                                "n_windows", "n_windows_b", "interpret")}
    zero = jnp.float32(0.0)
    print(f"rows={cfg['rows']} rows_b={cfg['rows_b']} "
          f"S_a={cfg['n_windows']*cfg['window']} "
          f"S_b={cfg['n_windows_b']*cfg['window']} unroll={unroll}")

    rec_f = jax.jit(lambda sc, cm: record_forward_q(
        sc, cm, W, H, zero, zero, **rcfg))
    fb, rec, ok = rec_f(scene, cam)
    segs = float(rec_segments(rec))
    print(f"ok={bool(ok)} segs={segs:.0f}")
    t_rec = timeit(rec_f, scene, cam)
    print(f"record forward: {t_rec*1e3:.1f} ms = {segs/t_rec/1e6:.1f} Mray/s")

    rep = jax.jit(lambda sc, cm: replay_fb(
        sc, cm, rec, zero, width=W, height=H, npx=npx, max_depth=DEPTH,
        attenuate=True, t_min=1e-3, seed=0, window=cfg["window"],
        unroll=unroll))
    fb_r = rep(scene, cam)
    err = float(jnp.max(jnp.abs(fb_r - fb)))
    rel = err / max(float(jnp.max(jnp.abs(fb))), 1e-9)
    print(f"replay fb max abs err = {err:.3e} (rel {rel:.2e})")
    t_fwd = timeit(rep, scene, cam)
    print(f"replay fb forward: {t_fwd*1e3:.1f} ms")

    sc_p, sc_s = P.partition(scene)
    cm_p, cm_s = P.partition(cam)
    gbar = jnp.ones((npx, 3), jnp.float32) / (3.0 * npx)

    def loss_p(sp, cp):
        out = replay_fb(P.combine(sp, sc_s), P.combine(cp, cm_s), rec,
                        zero, width=W, height=H, npx=npx, max_depth=DEPTH,
                        attenuate=True, t_min=1e-3, seed=0,
                        window=cfg["window"], unroll=unroll)
        return jnp.vdot(out, gbar)

    vg = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    t_vg = timeit(vg, sc_p, cm_p)
    print(f"replay grad (fwd+bwd): {t_vg*1e3:.1f} ms")
    print(f"backward total ~= {t_vg*1e3:.1f} ms = {segs/t_vg/1e6:.1f} "
          f"Mray/s; grad_step ~= {segs/(t_vg+t_rec)/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()
