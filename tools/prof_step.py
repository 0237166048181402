"""Decompose render_wave cost on TPU: per-step kernel time, XLA texel-gather
time, and the real iteration counts of phase A/B at bench shapes.

Run: python tools/prof_step.py   (on the axon TPU)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE

W, H, SPP, DEPTH = 800, 600, 80, 50
TILE_ROWS = 64

scene, cam = build_final_scene(W / H)
n_pix = W * H
tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
atlas = scene.textures.atlas
a32 = atlas.astype(jnp.uint32)
atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
n_atlas = int(atlas.shape[0])
print("atlas texels:", n_atlas, flush=True)

# phase-B-like lane count
lanes = _round_up(int(n_pix * 1.25), TILE_ROWS * LANE)
rows = lanes // LANE
sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(SPP), 0.0)
st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send,
                  jnp.ones(sh, f32))

step0 = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                          attenuate=False, tile_rows=TILE_ROWS,
                          interpret=False)


def bench(fn, *args, trials=3, warm=1):
    for _ in range(warm):
        r = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


# ---- 1. chain slope WITHOUT gather (zero texels fed each step) -------------
def chain_nogather(n):
    @jax.jit
    def f(st):
        out = step0(tables, st)
        def body(i, out):
            z = jnp.zeros(sh, jnp.uint32)
            return step0(tables, out.state, out, z)
        out = jax.lax.fori_loop(0, n, body, out)
        return out.state.ox
    return f

t2, _ = bench(chain_nogather(2), st0)
t12, _ = bench(chain_nogather(12), st0)
per_k = (t12 - t2) / 10
print(f"kernel-only step: {per_k*1e3:.2f} ms  "
      f"({lanes/per_k/1e6:.1f} Mlane/s)", flush=True)

# ---- 2. chain slope WITH the real gather -----------------------------------
def chain_gather(n):
    @jax.jit
    def f(st):
        out = step0(tables, st)
        def body(i, out):
            idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
            texel = jnp.take(atlas_u32, idx, axis=0)
            return step0(tables, out.state, out, texel)
        out = jax.lax.fori_loop(0, n, body, out)
        return out.state.ox
    return f

g2, _ = bench(chain_gather(2), st0)
g12, _ = bench(chain_gather(12), st0)
per_g = (g12 - g2) / 10
print(f"kernel+gather step: {per_g*1e3:.2f} ms  "
      f"(gather adds {(per_g-per_k)*1e3:.2f} ms)", flush=True)

# ---- 3. pure gather cost ----------------------------------------------------
idx0 = jnp.abs(lane_ids) % n_atlas
gath = jax.jit(lambda i: jnp.take(atlas_u32, i, axis=0))
tg, _ = bench(gath, idx0)
print(f"pure XLA take({lanes} idx from {n_atlas}): {tg*1e3:.2f} ms", flush=True)

# ---- 4. while_loop iteration counts (the real render loop, with counter) ---
def count_iters(st):
    @jax.jit
    def f(st):
        out = step0(tables, st)
        def cond(c):
            out, i = c
            return jnp.any(out.state.alive > 0.0)
        def body(c):
            out, i = c
            idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
            texel = jnp.take(atlas_u32, idx, axis=0)
            return step0(tables, out.state, out, texel), i + 1
        out, iters = jax.lax.while_loop(cond, body, (out, jnp.int32(0)))
        return iters, jnp.sum(out.state.wrk)
    return f(st)

t0 = time.perf_counter()
iters, segs = jax.block_until_ready(count_iters(st0))
dt = time.perf_counter() - t0
iters = int(iters); segs = float(segs)
occ = segs / (iters * lanes)
print(f"single-phase render {W}x{H} spp{SPP}: {dt:.1f} s, iters={iters}, "
      f"segs={segs/1e6:.1f}M, occupancy={occ:.3f}, "
      f"{segs/dt/1e6:.2f} Mray/s  (per-iter {dt/iters*1e3:.1f} ms)",
      flush=True)
