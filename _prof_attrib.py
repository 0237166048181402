"""Cost attribution inside wave_bounce: shrink each primitive table to zero
and measure the in-loop bounce slope."""
import time, functools
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE

W, H = 800, 600
scene, cam = build_final_scene(W / H)
n_pix = W * H
tile_rows = 64
rows = _round_up(n_pix, tile_rows * 128) // LANE
lanes = rows * LANE

tables0 = WB.pack_scene(scene)
tables0 = tables0._replace(cam=WB.pack_camera(cam, W, H),
                           seed=jnp.zeros(1, jnp.uint32))
print("sph", tables0.sph.shape, "rect", tables0.rect.shape,
      "tri", tables0.tri.shape, "med", tables0.med.shape,
      "sph_segs", tables0.sph_segs, sep="\n")

sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(8), 0.0)
st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send, jnp.ones(sh, f32))


def slope(tables, st):
    step = jax.jit(functools.partial(
        WB.wave_bounce, t_min=1e-3, max_depth=50, attenuate=False,
        tile_rows=tile_rows))
    def loop(n):
        def f(st):
            def body(i, st):
                return step(tables, st).state
            return jax.lax.fori_loop(0, n, body, st)
        fj = jax.jit(f)
        r = fj(st); jax.block_until_ready(r.ox)
        t0 = time.perf_counter()
        r = fj(st); jax.block_until_ready(r.ox)
        return time.perf_counter() - t0
    return (loop(12) - loop(2)) / 10


st1 = jax.jit(functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                                attenuate=False, tile_rows=tile_rows))(
    tables0, st0).state

full = slope(tables0, st1)
print(f"full: {full*1e3:.2f} ms/bounce  {lanes/full/1e6:.1f} Mlane/s")

import numpy as np
zseg = jnp.zeros_like(tables0.sph_segs)
t_nosph = tables0._replace(sph=tables0.sph[:, :1], sph_segs=jnp.minimum(tables0.sph_segs, 0))
nosph = slope(t_nosph, st1)
print(f"no spheres: {nosph*1e3:.2f} ms/bounce (sphere fold = {(full-nosph)*1e3:.2f} ms)")

t_norect = tables0._replace(rect=tables0.rect[:, :1], rect_segs=jnp.minimum(tables0.rect_segs, 0))
norect = slope(t_norect, st1)
print(f"no rects: {norect*1e3:.2f} ms/bounce (rect fold = {(full-norect)*1e3:.2f} ms)")

t_notri = tables0._replace(tri=tables0.tri[:, :1], tri_segs=jnp.minimum(tables0.tri_segs, 0))
notri = slope(t_notri, st1)
print(f"no tris: {notri*1e3:.2f} ms/bounce (tri fold = {(full-notri)*1e3:.2f} ms)")

t_nomed = tables0._replace(med=tables0.med[:, :0])
nomed = slope(t_nomed, st1)
print(f"no media: {nomed*1e3:.2f} ms/bounce (media = {(full-nomed)*1e3:.2f} ms)")

# everything off -> scatter + texture + regen + record cost
t_none = t_nosph._replace(rect=tables0.rect[:, :1], rect_segs=jnp.minimum(tables0.rect_segs, 0),
                          tri=tables0.tri[:, :1], tri_segs=jnp.minimum(tables0.tri_segs, 0),
                          med=tables0.med[:, :0])
none = slope(t_none, st1)
print(f"no primitives: {none*1e3:.2f} ms/bounce (fixed cost)")
