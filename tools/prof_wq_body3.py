"""Dissect the deposit cost inside the real wq loop."""
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
scene, cam = build_final_scene(W / H)
n_pix = W * H
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
        def body(i, c):
            st, fbr, fbg, fbb = c
            out = step(tables, st)
            st = out.state
            if variant == "zero-only":
                z = jnp.zeros_like(st.accx)
                st = st._replace(accx=z, accy=z, accz=z)
            elif variant == "scatter-no-zero":
                idx = st.pix.reshape(-1).astype(jnp.int32)
                m = "promise_in_bounds"
                fbr = fbr.at[idx].add(st.accx.reshape(-1), mode=m)
                fbg = fbg.at[idx].add(st.accy.reshape(-1), mode=m)
                fbb = fbb.at[idx].add(st.accz.reshape(-1), mode=m)
            elif variant == "full-pib":
                idx = st.pix.reshape(-1).astype(jnp.int32)
                m = "promise_in_bounds"
                fbr = fbr.at[idx].add(st.accx.reshape(-1), mode=m)
                fbg = fbg.at[idx].add(st.accy.reshape(-1), mode=m)
                fbb = fbb.at[idx].add(st.accz.reshape(-1), mode=m)
                z = jnp.zeros_like(st.accx)
                st = st._replace(accx=z, accy=z, accz=z)
            return st, fbr, fbg, fbb
        return jax.lax.fori_loop(0, 10, body, (st, fbr, fbg, fbb))
    return f


def bench(fn, *a):
    r = fn(*a); jax.block_until_ready(r[1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*a); jax.block_until_ready(r[1])
        best = min(best, time.perf_counter() - t0)
    return best / 10


st0 = _zeros_state(rows)
# make lanes alive with real rays so the kernel does representative work
st0 = st0._replace(alive=jnp.ones(sh, f32),
                   dx=jnp.ones(sh, f32), dy=jnp.full(sh, -0.3, f32),
                   dz=jnp.full(sh, 0.2, f32),
                   ox=jnp.full(sh, 13.0, f32), oy=jnp.full(sh, 3.0, f32),
                   oz=jnp.full(sh, 3.0, f32),
                   rng=jnp.arange(lanes, dtype=jnp.uint32).reshape(sh))
fb0 = jnp.zeros((n_pix,), f32)
variants = sys.argv[1:] or ["none", "zero-only", "scatter-no-zero",
                            "full-pib"]
for v in variants:
    t = bench(make(v), st0, fb0, fb0, fb0)
    print(f"variant '{v}': {t*1e3:.2f} ms/step", flush=True)
