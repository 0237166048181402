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
print("lanes", lanes, "rows", rows)

tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
tables = jax.tree.map(jax.device_put, tables)

sh = (rows, LANE)
f32 = jnp.float32
lane_ids = jnp.arange(lanes, dtype=jnp.int32).reshape(sh)
pix = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
send = jnp.where(lane_ids < n_pix, f32(8), 0.0)
st = _init_state(rows, pix, jnp.full(sh, -1.0, f32), send, jnp.ones(sh, f32))

step = jax.jit(functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                                 attenuate=False, tile_rows=tile_rows))

out = step(tables, st)
jax.block_until_ready(out.state.ox)
st1 = out.state
t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    out = step(tables, st1)
jax.block_until_ready(out.state.ox)
dt = (time.perf_counter() - t0) / reps
print(f"wave_bounce: {dt*1e3:.2f} ms -> {lanes/dt/1e6:.1f} Mlane/s")

# fixup gather cost
atlas = scene.textures.atlas
def fix(idx):
    idxc = jnp.clip(idx.astype(jnp.int32), 0, atlas.shape[0]-1)
    texel = jnp.take(atlas, idxc, axis=0).astype(jnp.float32)
    return texel.sum(-1)
fixj = jax.jit(fix)
r = fixj(out.fix_idx); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(reps):
    r = fixj(out.fix_idx)
jax.block_until_ready(r)
print(f"atlas gather: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

# in-loop 10 bounces
def ten(st):
    def body(i, st):
        o = step(tables, st)
        return o.state
    return jax.lax.fori_loop(0, 10, body, st)
tenj = jax.jit(ten)
r = tenj(st1); jax.block_until_ready(r.ox)
t0 = time.perf_counter()
r = tenj(st1); jax.block_until_ready(r.ox)
dt = (time.perf_counter() - t0) / 10
print(f"in-loop bounce: {dt*1e3:.2f} ms -> {lanes/dt/1e6:.1f} Mlane/s")
