"""Raw wq_kernel cost on TPU: one B=16 call vs 16x wave_bounce."""
import functools, sys, time
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB, wq_kernel as WQ
from path_tracer_tpu.engine.wq2 import _zeros_state, _round_up, pick_chunk, LANE

W,H,SPP,D = 800,600,80,50
TILE=32
scene, cam = build_final_scene(W/H)
n_pix=W*H; C=pick_chunk(SPP); cpp=SPP//C
lanes=_round_up(n_pix, TILE*LANE); rows=lanes//LANE
tables = WB.pack_scene(scene)._replace(cam=WB.pack_camera(cam,W,H), seed=jnp.zeros(1,jnp.uint32))
call = functools.partial(WQ.wq_call, t_min=1e-3, max_depth=D, attenuate=False,
                         n_bounce=C, chunk=C, cpp=cpp, tile_rows=TILE, interpret=False)

@jax.jit
def one(st, qs):
    out = call(tables, st, qs)
    return out.state, out.qstate

st0 = _zeros_state(rows)
qs0 = jnp.array([0,0,n_pix*cpp,0], jnp.int32)

def bench(fn, *a):
    r = fn(*a); jax.block_until_ready(r[1])
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); r=fn(*a); jax.block_until_ready(r[1])
        best=min(best, time.perf_counter()-t0)
    return best

t = bench(one, st0, qs0)
print(f"wq_call B={C}: {t*1e3:.1f} ms  ({t*1e3/C:.2f} ms/bounce)", flush=True)

# compare: 16 chained wave_bounce calls (old kernel), no glue
from path_tracer_tpu.engine.wq import _zeros_state as zs1
st1 = zs1(rows)
step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=D,
                         attenuate=False, tile_rows=TILE, interpret=False)
@jax.jit
def sixteen(st):
    def body(i, st):
        return step(tables, st).state
    return jax.lax.fori_loop(0, 16, body, st)
t = bench(lambda s: (None, sixteen(s).ox), st1)
print(f"16x wave_bounce: {t*1e3:.1f} ms  ({t*1e3/16:.2f} ms/bounce)", flush=True)
