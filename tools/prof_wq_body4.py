"""Deposit alternatives inside the real wq loop: per-sample radiance log
(unique set-scatter, mode=drop) vs fb scatter-add."""
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
    def f(st, pixi, si, rr, rg, rb):
        def body(i, c):
            st, rr, rg, rb = c
            out = step(tables, st)
            stn = out.state
            fin = (st.alive > 0.0) & (stn.alive <= 0.0)
            st = stn
            if variant == "radset":
                sid = pixi * SPP + si + i  # int32, unique per lane
                sid = jnp.where(fin.reshape(-1), sid, total)  # oob -> drop
                rr = rr.at[sid].set(st.accx.reshape(-1), mode="drop",
                                    unique_indices=True)
                rg = rg.at[sid].set(st.accy.reshape(-1), mode="drop",
                                    unique_indices=True)
                rb = rb.at[sid].set(st.accz.reshape(-1), mode="drop",
                                    unique_indices=True)
            elif variant == "radset-nofin":
                sid = pixi * SPP + si + i
                rr = rr.at[sid].set(st.accx.reshape(-1), mode="drop",
                                    unique_indices=True)
                rg = rg.at[sid].set(st.accy.reshape(-1), mode="drop",
                                    unique_indices=True)
                rb = rb.at[sid].set(st.accz.reshape(-1), mode="drop",
                                    unique_indices=True)
            z = jnp.zeros_like(st.accx)
            st = st._replace(accx=z, accy=z, accz=z)
            return st, rr, rg, rb
        return jax.lax.fori_loop(0, 10, body, (st, rr, rg, rb))
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
st0 = st0._replace(alive=jnp.ones(sh, f32),
                   dx=jnp.ones(sh, f32), dy=jnp.full(sh, -0.3, f32),
                   dz=jnp.full(sh, 0.2, f32),
                   ox=jnp.full(sh, 13.0, f32), oy=jnp.full(sh, 3.0, f32),
                   oz=jnp.full(sh, 3.0, f32),
                   rng=jnp.arange(lanes, dtype=jnp.uint32).reshape(sh))
pixi = (jnp.arange(lanes, dtype=jnp.int32) * 7919) % n_pix
si = jnp.zeros((lanes,), jnp.int32)
radz = jnp.zeros((total,), f32)
for v in sys.argv[1:] or ["radset", "radset-nofin"]:
    t = bench(make(v), st0, pixi, si, radz, radz, radz)
    print(f"variant '{v}': {t*1e3:.2f} ms/step", flush=True)
