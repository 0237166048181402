"""Deposit: slot-rotation (flush every S steps) + dus-only baseline."""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wq import _zeros_state, _round_up, LANE

W, H, SPP = 800, 600, 80
TILE = 32
S = 8
scene, cam = build_final_scene(W / H)
n_pix = W * H
total = n_pix * SPP
lanes = _round_up(n_pix, TILE * LANE)
rows = lanes // LANE
sh = (rows, LANE)
f32 = jnp.float32

tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                         attenuate=False, tile_rows=TILE, interpret=False)


def make(variant):
    @jax.jit
    def f(st, fbr, fbg, fbb):
        pr = jnp.zeros((S, rows, LANE), f32)
        pv = [jnp.zeros((S, rows, LANE), f32) for _ in range(3)]
        def body(i, c):
            st, fbr, fbg, fbb, pr, pv0, pv1, pv2 = c
            out = step(tables, st)
            st = out.state
            slot = i % S
            if variant in ("slots8", "dus-only"):
                pr = jax.lax.dynamic_update_slice(
                    pr, st.pix[None], (slot, 0, 0))
                pv0 = jax.lax.dynamic_update_slice(
                    pv0, st.accx[None], (slot, 0, 0))
                pv1 = jax.lax.dynamic_update_slice(
                    pv1, st.accy[None], (slot, 0, 0))
                pv2 = jax.lax.dynamic_update_slice(
                    pv2, st.accz[None], (slot, 0, 0))
            if variant == "slots8":
                def flush(ops):
                    fbr, fbg, fbb, pr, pv0, pv1, pv2 = ops
                    idx = pr.reshape(-1).astype(jnp.int32)
                    m = "promise_in_bounds"
                    return (fbr.at[idx].add(pv0.reshape(-1), mode=m),
                            fbg.at[idx].add(pv1.reshape(-1), mode=m),
                            fbb.at[idx].add(pv2.reshape(-1), mode=m),
                            pr, jnp.zeros_like(pv0), jnp.zeros_like(pv1),
                            jnp.zeros_like(pv2))
                fbr, fbg, fbb, pr, pv0, pv1, pv2 = jax.lax.cond(
                    slot == S - 1, flush, lambda o: o,
                    (fbr, fbg, fbb, pr, pv0, pv1, pv2))
            z = jnp.zeros_like(st.accx)
            st = st._replace(accx=z, accy=z, accz=z)
            return st, fbr, fbg, fbb, pr, pv0, pv1, pv2
        r = jax.lax.fori_loop(0, 16, body, (st, fbr, fbg, fbb, pr, *pv))
        return r[:4]
    return f


def bench(fn, *a):
    r = fn(*a); jax.block_until_ready(r[1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*a); jax.block_until_ready(r[1])
        best = min(best, time.perf_counter() - t0)
    return best / 16


st0 = _zeros_state(rows)
st0 = st0._replace(alive=jnp.ones(sh, f32),
                   dx=jnp.ones(sh, f32), dy=jnp.full(sh, -0.3, f32),
                   dz=jnp.full(sh, 0.2, f32),
                   ox=jnp.full(sh, 13.0, f32), oy=jnp.full(sh, 3.0, f32),
                   oz=jnp.full(sh, 3.0, f32),
                   rng=jnp.arange(lanes, dtype=jnp.uint32).reshape(sh))
fb0 = jnp.zeros((n_pix,), f32)
for v in sys.argv[1:] or ["dus-only", "slots8"]:
    t = bench(make(v), st0, fb0, fb0, fb0)
    print(f"variant '{v}': {t*1e3:.2f} ms/step", flush=True)
