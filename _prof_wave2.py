import time, functools
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.engine.wave import _init_state, _round_up, LANE

print(jax.devices(), jax.default_backend())

W, H = 800, 600
scene, cam = build_final_scene(W / H)
n_pix = W * H
tile_rows = 64
rows = _round_up(n_pix, tile_rows * 128) // LANE
lanes = rows * LANE

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

# warm
out = step(tables, st)
jax.block_until_ready(out.state.ox)

# single call, synchronous, chained input (unique each time)
st1 = out.state
for trial in range(3):
    t0 = time.perf_counter()
    out = step(tables, st1)
    jax.block_until_ready(out.state.ox)
    dt = time.perf_counter() - t0
    st1 = out.state
    print(f"sync single call: {dt*1e3:.2f} ms -> {lanes/dt/1e6:.1f} Mlane/s")

# fori_loop slope: n=2 vs n=12 to separate fixed overhead
def loop(n):
    def f(st):
        def body(i, st):
            return step(tables, st).state
        return jax.lax.fori_loop(0, n, body, st)
    fj = jax.jit(f)
    r = fj(st1); jax.block_until_ready(r.ox)
    t0 = time.perf_counter()
    r = fj(st1); jax.block_until_ready(r.ox)
    return time.perf_counter() - t0

d2 = loop(2); d12 = loop(12)
per = (d12 - d2) / 10
print(f"loop slope: {per*1e3:.2f} ms/bounce -> {lanes/per/1e6:.1f} Mlane/s"
      f"  (n2={d2*1e3:.1f}ms n12={d12*1e3:.1f}ms)")

def unrolled(n):
    def f(st):
        for _ in range(n):
            st = step(tables, st).state
        return st
    fj = jax.jit(f)
    r = fj(st1); jax.block_until_ready(r.ox)
    t0 = time.perf_counter()
    r = fj(st1); jax.block_until_ready(r.ox)
    return time.perf_counter() - t0

u2 = unrolled(2); u12 = unrolled(12)
per_u = (u12 - u2) / 10
print(f"unrolled slope: {per_u*1e3:.2f} ms/bounce -> {lanes/per_u/1e6:.1f} Mlane/s"
      f"  (n2={u2*1e3:.1f}ms n12={u12*1e3:.1f}ms)")
