import time
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.engine import intersect as I
from path_tracer_tpu.engine.scatter import scatter
from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.vec import Vec3
from path_tracer_tpu.ops.pallas.prim_fold import prim_fold

W, H = 800, 600
scene, cam = build_final_scene(W / H)
N = 480256
pix = jnp.arange(N, dtype=jnp.uint32) % (W * H)
state0 = rng_mod.seed_perf(pix, jnp.zeros(N, jnp.uint32), 0)
state0, o, d, t = jax.jit(lambda s: camera_rays(cam, W, H, pix, s))(state0)
alive = jnp.ones(N, bool)

def bench_loop(name, step, init, reps=10):
    """step: carry -> carry, iterated reps times inside ONE jit."""
    f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, c: step(c), c))
    r = f(init)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(init)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/iter")

# dispatch floor
bench_loop("noop(x*1.0000001)", lambda x: x * 1.0000001, o.x)

# fold in-loop (perturb input so nothing hoists)
def fold_step(c):
    o2 = Vec3(c, o.y, o.z)
    t_s, idx_s, *_ = prim_fold(scene, o2, d, t, 1e-3, scene.media.scan)
    return c + t_s * 1e-9
bench_loop("prim_fold", fold_step, o.x)

# intersect full in-loop
def int_step(c):
    o2 = Vec3(c, o.y, o.z)
    rng2, hit = I.intersect_scene(scene, o2, d, t, state0, alive, 1e-3, False, True)
    return c + hit.t * 1e-9 + hit.normal.x * 1e-9 + hit.u * 1e-9 + hit.mat * 1e-12
bench_loop("intersect_scene", int_step, o.x)

# scatter in-loop
_, hit0 = jax.jit(lambda: I.intersect_scene(scene, o, d, t, state0, alive, 1e-3, False, True))()
def sc_step(c):
    h = hit0._replace(u=c)
    rng2, sc = scatter(scene, h, d, state0, hit0.hit)
    return c + sc.direction.x * 1e-9 + sc.attenuation.x * 1e-9 + sc.emitted.x * 1e-9
bench_loop("scatter", sc_step, hit0.u)

# gather_rows in loop
mats = scene.materials
def g_step(c):
    rows = I.gather_rows(c, mats.mtype, mats.color.x, mats.color.y, mats.color.z,
                         mats.param, mats.tex)
    return (c + rows[0].astype(jnp.int32)) % 496
bench_loop("gather_rows(6 cols, 496 tab)", g_step, hit0.mat)

# single-col take
def take_step(c):
    v = jnp.take(mats.color.x, c)
    return (c + v.astype(jnp.int32)) % 496
bench_loop("jnp.take(1 col)", take_step, hit0.mat)

# unit vec in loop
def uv_step(s):
    s, v = rng_mod.next_unit_vec(s, alive)
    return s ^ v.x.astype(jnp.uint32)
bench_loop("next_unit_vec", uv_step, state0)

# media in loop
prefix0 = I._Best(t=jnp.full(N, jnp.inf), scan=jnp.full(N, I.BIG_SCAN, jnp.int32),
                  sub=jnp.zeros(N, jnp.int32), cls=jnp.zeros(N, jnp.int32),
                  idx=jnp.zeros(N, jnp.int32), tie=jnp.zeros(N, bool))
pre0 = jnp.zeros((1, N), jnp.float32) + jnp.inf
def med_step(s):
    s2, best = I.media_events(scene.media, o, d, s, prefix0, [], 1e-3, alive,
                              precomputed_prefix=pre0)
    return s2 ^ best.idx.astype(jnp.uint32)
bench_loop("media_events", med_step, state0)

# build_hit in loop
def bh_step(c):
    best = prefix0._replace(t=jnp.ones(N), idx=c)
    h = I.build_hit(scene, best, o, d, t)
    return (c + h.mat) % 400
bench_loop("build_hit", bh_step, (jnp.arange(N, dtype=jnp.int32) % 400))
