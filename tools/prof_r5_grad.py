"""r5 gradient-route profiling on the real chip: split the backward cost
into (cotangent prologue | replay scan fwd | replay vjp) and sweep
rows/avg_path_hint.  Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/prof_r5_grad.py [rows] [hint]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from path_tracer_tpu.diff import params as P
from path_tracer_tpu.diff.queued_vjp import (_cotangents_at_sites,
                                             rec_segments,
                                             record_forward_q,
                                             render_grad_fb, replay_proxy)
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


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hint = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    scene, cam = build_final_scene(W / H)
    npx = W * H
    f = render_grad_fb(W, H, npx, SPP, max_depth=DEPTH, attenuate=True,
                       rows=rows, avg_path_hint=hint)
    cfg = f.cfg
    rcfg = {k: cfg[k] for k in ("npx", "spp", "max_depth", "attenuate",
                                "t_min", "seed", "rows", "rows_b",
                                "tile_rows", "tile_rows_b", "window", "chunk",
                                "n_windows", "n_windows_b", "interpret")}
    zero = jnp.float32(0.0)
    print(f"rows={cfg['rows']} rows_b={cfg['rows_b']} "
          f"S_a={cfg['n_windows']*cfg['window']} "
          f"S_b={cfg['n_windows_b']*cfg['window']}")

    rec_f = jax.jit(lambda sc, cm: record_forward_q(
        sc, cm, W, H, zero, zero, **rcfg))
    fb, rec, ok = rec_f(scene, cam)
    segs = float(rec_segments(rec))
    print(f"ok={bool(ok)} segs={segs:.0f}")
    t_rec = timeit(rec_f, scene, cam)
    print(f"record forward: {t_rec*1e3:.1f} ms = {segs/t_rec/1e6:.1f} Mray/s")

    gones = jnp.ones((npx, 3), jnp.float32)
    cot = jax.jit(lambda r: _cotangents_at_sites(
        r, gones, npx=npx, spp=SPP, pix_base=zero, samp_base=zero))
    g = cot(rec)
    t_cot = timeit(cot, rec)
    print(f"cotangent prologue: {t_cot*1e3:.1f} ms")

    prox = jax.jit(lambda sc, cm: replay_proxy(
        sc, cm, rec, g, width=W, height=H, max_depth=DEPTH,
        attenuate=True, t_min=1e-3, seed=0))
    t_fwd = timeit(prox, scene, cam)
    print(f"replay forward: {t_fwd*1e3:.1f} ms")

    sc_p, sc_s = P.partition(scene)
    cm_p, cm_s = P.partition(cam)

    def proxy_p(sp, cp):
        return replay_proxy(P.combine(sp, sc_s), P.combine(cp, cm_s), rec,
                            g, width=W, height=H, max_depth=DEPTH,
                            attenuate=True, t_min=1e-3, seed=0)

    vg = jax.jit(jax.grad(proxy_p, argnums=(0, 1)))
    t_vg = timeit(vg, sc_p, cm_p)
    print(f"replay grad (fwd+bwd): {t_vg*1e3:.1f} ms")
    tot = t_cot + t_vg
    print(f"backward total ~= {tot*1e3:.1f} ms = {segs/tot/1e6:.1f} Mray/s; "
          f"grad_step ~= {segs/(tot+t_rec)/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()
