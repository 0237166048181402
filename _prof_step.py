import time, functools
import numpy as np
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
tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
atlas = scene.textures.atlas
a32 = atlas.astype(jnp.uint32)
atlas_u32 = jax.device_put(a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16))
n_atlas = atlas.shape[0]

sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(50), 0.0)
st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send, jnp.ones(sh, f32))
step0 = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                          attenuate=False, tile_rows=tile_rows)

def slope(mkbody, name):
    def f(n):
        def g(st):
            out = step0(tables, st)
            body = mkbody()
            out = jax.lax.fori_loop(0, n, body, out)
            return out.state
        gj = jax.jit(g)
        r = np.asarray(gj(st0).ox[0, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = np.asarray(gj(st0).ox[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best
    d = (f(22) - f(2)) / 20
    print(f"{name:30s}: {d*1e3:6.2f} ms/bounce ({lanes/d/1e6:.1f} Mlane/s)")

# kernel only, zero fix
def mk_a():
    zf = WB.zero_fix(rows)
    def body(i, out):
        return WB.wave_bounce(tables, out.state, t_min=1e-3, max_depth=50,
                              attenuate=False, tile_rows=tile_rows)
    return body
slope(mk_a, "kernel only (no fix chain)")

# kernel + fix chain with zero texel (no gather)
def mk_b():
    tex0 = jnp.zeros((rows, LANE), jnp.uint32)
    def body(i, out):
        return step0(tables, out.state, out, tex0)
    return body
slope(mk_b, "kernel + fix, const texel")

# kernel + gather
def mk_c():
    def body(i, out):
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = jnp.take(atlas_u32, idx, axis=0)
        return step0(tables, out.state, out, texel)
    return body
slope(mk_c, "kernel + fix + gather")
