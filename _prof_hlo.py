import functools
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE

W, H = 800, 600
scene, cam = build_final_scene(W / H)
n_pix = W * H
tile_rows = 64
rows = _round_up(n_pix, tile_rows * 128) // LANE
tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
atlas = scene.textures.atlas
a32 = atlas.astype(jnp.uint32)
atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
n_atlas = atlas.shape[0]
sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(rows*LANE, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(50), 0.0)
st0 = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send, jnp.ones(sh, f32))
step0 = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                          attenuate=False, tile_rows=tile_rows)

def g(st):
    out = step0(tables, st)
    def body(i, out):
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = jnp.take(atlas_u32, idx, axis=0)
        return step0(tables, out.state, out, texel)
    out = jax.lax.fori_loop(0, 22, body, out)
    return out.state

txt = jax.jit(g).lower(st0).compile().as_text()
import re
print("total custom-calls:", txt.count("custom-call"))
print("gathers:", len(re.findall(r" gather\(", txt)))
print("while ops:", txt.count("while("))
print("copies:", len(re.findall(r"copy\(", txt)))
print("copy-start:", txt.count("copy-start"))
# big allocations / copy sizes
for m in re.findall(r"f32\[3776,128\][^\n]*copy[^\n]*", txt)[:5]:
    print(m[:160])
