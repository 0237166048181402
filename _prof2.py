import time
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.engine import intersect as I
from path_tracer_tpu.engine.scatter import scatter
from path_tracer_tpu.scene.textures import texture_value
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

def bench(name, fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms")
    return r

# pieces
fold = jax.jit(lambda o, d, t: prim_fold(scene, o, d, t, 1e-3, scene.media.scan))
outs = bench("prim_fold", fold, o, d, t)

def after_fold(o, d, t, state):
    (t_s, idx_s, t_r, idx_r, t_t3, idx_t3, prim_prefix) = prim_fold(
        scene, o, d, t, 1e-3, scene.media.scan)
    return t_s, idx_s
bench("fold only (discard)", jax.jit(after_fold), o, d, t, state)

# full intersect minus fold cost
full = jax.jit(lambda o, d, t, s: I.intersect_scene(scene, o, d, t, s, alive, 1e-3, False, True))
rng2, hit = bench("intersect full", full, o, d, t, state)

# media_events alone (with precomputed prefix)
def media_only(o, d, state):
    prefix = I._Best(t=jnp.full(N, jnp.inf), scan=jnp.full(N, I.BIG_SCAN, jnp.int32),
                     sub=jnp.zeros(N, jnp.int32), cls=jnp.zeros(N, jnp.int32),
                     idx=jnp.zeros(N, jnp.int32), tie=jnp.zeros(N, bool))
    pre = jnp.zeros((len(scene.media.r), N), jnp.float32) + jnp.inf
    return I.media_events(scene.media, o, d, state, prefix, [], 1e-3, alive,
                          precomputed_prefix=pre)
bench("media_events", jax.jit(media_only), o, d, state)

# build_hit alone
def bh(o, d, t):
    best = I._Best(t=jnp.ones(N), scan=jnp.zeros(N, jnp.int32),
                   sub=jnp.zeros(N, jnp.int32), cls=jnp.zeros(N, jnp.int32),
                   idx=(jnp.arange(N, dtype=jnp.int32) % 400),
                   tie=jnp.zeros(N, bool))
    return I.build_hit(scene, best, o, d, t)
bench("build_hit", jax.jit(bh), o, d, t)

# scatter pieces
f3 = jax.jit(lambda hit, d, s: scatter(scene, hit, d, s, hit.hit))
bench("scatter full", f3, hit, d, state)

texf = jax.jit(lambda hit: texture_value(scene.textures, jnp.zeros(N, jnp.int32) + 2, hit.u, hit.v, hit.p))
bench("texture_value", texf, hit)

# gather_rows cost
mats = scene.materials
gr = jax.jit(lambda m: I.gather_rows(m, mats.mtype, mats.color.x, mats.color.y,
                                     mats.color.z, mats.param, mats.tex))
bench("gather_rows(mats)", gr, hit.mat)

# rng unit vec
uv = jax.jit(lambda s, m: rng_mod.next_unit_vec(s, m))
bench("next_unit_vec", uv, state, alive)
uball = jax.jit(lambda s, m: rng_mod.next_in_unit_ball(s, m))
bench("next_in_unit_ball", uball, state, alive)

print("n tex atlas:", scene.textures.atlas.shape if hasattr(scene.textures, 'atlas') else "?")
print("mats:", mats.mtype.shape, "spheres:", scene.spheres.radius.shape,
      "rects:", scene.rects.k.shape, "tris:", scene.triangles.mat.shape,
      "media:", scene.media.r.shape)
