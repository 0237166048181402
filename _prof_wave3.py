"""E2E: time the new _run_phase step (kernel + texel gather) via unrolled
chain slope with true fetch, then a full render_wave bench."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE, render_wave

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
atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
n_atlas = atlas.shape[0]
print("atlas texels:", n_atlas)

sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(50), 0.0)
st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send, jnp.ones(sh, f32))

step0 = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                          attenuate=False, tile_rows=tile_rows)

def chain(n):
    def f(st):
        out = step0(tables, st)
        def body(i, out):
            idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
            texel = jnp.take(atlas_u32, idx, axis=0)
            return step0(tables, out.state, out, texel)
        out = jax.lax.fori_loop(0, n, body, out)
        return out.state
    fj = jax.jit(f)
    r = np.asarray(fj(st0).ox[0, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = np.asarray(fj(st0).ox[0, :1])
        best = min(best, time.perf_counter() - t0)
    return best

d2 = chain(2); d22 = chain(22)
per = (d22 - d2) / 20
print(f"step slope (kernel+gather): {per*1e3:.2f} ms -> {lanes/per/1e6:.1f} Mlane/s")

# full render timing
for spp in (80,):
    img, segs = render_wave(scene, cam, W, H, spp, max_depth=50,
                            return_segments=True)
    segs = float(segs)
    t0 = time.perf_counter()
    img, segs2 = render_wave(scene, cam, W, H, spp, max_depth=50,
                             return_segments=True)
    segs2 = float(segs2)
    dt = time.perf_counter() - t0
    print(f"render spp={spp}: {dt:.2f}s  segs={segs2/1e6:.1f}M "
          f"-> {segs2/dt/1e6:.1f} Mray/s")
