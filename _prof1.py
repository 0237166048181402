import time, functools
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.engine.integrator import _bounce, PathState, camera_rays
from path_tracer_tpu.engine.intersect import intersect_scene
from path_tracer_tpu.engine.scatter import scatter
from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.vec import Vec3
from path_tracer_tpu.ops.pallas.prim_fold import prim_fold

W, H = 800, 600
scene, cam = build_final_scene(W / H)
N = 480256
pix = jnp.arange(N, dtype=jnp.uint32) % (W * H)
state = rng_mod.seed_perf(pix, jnp.zeros(N, jnp.uint32), 0)
state, o, d, t = jax.jit(lambda s: camera_rays(cam, W, H, pix, s))(state)
alive = jnp.ones(N, bool)

def bench(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.2f} ms -> {N/dt/1e6:.1f} Mray/s")
    return r

# 1. prim_fold alone
f1 = jax.jit(lambda o,d,t: prim_fold(scene, o, d, t, 1e-3, scene.media.scan))
bench("prim_fold", f1, o, d, t)

# 2. full intersect_scene (pallas path)
f2 = jax.jit(lambda o,d,t,s: intersect_scene(scene, o, d, t, s, alive, 1e-3, False, True))
rng2, hit = bench("intersect_scene(pallas)", f2, o, d, t, state)

# 3. scatter alone
f3 = jax.jit(lambda hit,d,s: scatter(scene, hit, d, s, hit.hit))
bench("scatter", f3, hit, d, state)

# 4. full bounce
ps = PathState(o=o, d=d, time=t, rng=state,
               throughput=Vec3.zeros((N,)) + 1.0 if False else Vec3(jnp.ones(N), jnp.ones(N), jnp.ones(N)),
               radiance=Vec3(jnp.zeros(N), jnp.zeros(N), jnp.zeros(N)),
               alive=alive)
f4 = jax.jit(lambda ps: _bounce(scene, ps, False, 1e-3, exact=False, use_pallas=True))
bench("full _bounce", f4, ps)

# 5. bounce xN scan (how XLA handles it inside a loop)
def ten(ps):
    return jax.lax.fori_loop(0, 10, lambda i, s: _bounce(scene, s, False, 1e-3, exact=False, use_pallas=True), ps)
f5 = jax.jit(ten)
r = f5(ps); jax.block_until_ready(r)
t0 = time.perf_counter()
r = f5(ps); jax.block_until_ready(r)
dt = time.perf_counter() - t0
print(f"10-bounce fori: {dt*1e3:.2f} ms -> {10*N/dt/1e6:.1f} Mray/s")
