"""Round-3: why does the wq while-loop cost ~38 ms/iter when its parts
measure ~2 ms standalone?  Time the body as a jitted function, and a
fixed-trip-count scan of it."""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50
LANE = 128
TILE_ROWS = 32


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    scene, cam = build_final_scene(W / H)
    n_pix = W * H
    total = n_pix * SPP
    quantum = TILE_ROWS * LANE
    lanes = WQ._round_up(min(n_pix, total), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    inv255 = f32(1.0 / 255.0)

    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    def refill(st, counter):
        dead = st.alive <= 0.0
        dead_i = dead.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i
        navail = total - counter
        grant_f = dead.reshape(-1) & (rank < navail)
        sid = counter + rank
        pix_new = sid // SPP
        k_new = sid - pix_new * SPP
        rng0 = rng_mod.splitmix32(
            pix_new.astype(jnp.uint32)
            ^ rng_mod.splitmix32(k_new.astype(jnp.uint32) ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
        grant = grant_f.reshape(sh)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        st = st._replace(
            ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
            dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
            tm=sel(tmv, st.tm),
            rng=jnp.where(grant, rng1.reshape(sh), st.rng),
            tpx=jnp.where(grant, one, st.tpx),
            tpy=jnp.where(grant, one, st.tpy),
            tpz=jnp.where(grant, one, st.tpz),
            radx=jnp.where(grant, zero, st.radx),
            rady=jnp.where(grant, zero, st.rady),
            radz=jnp.where(grant, zero, st.radz),
            alive=jnp.where(grant, one, st.alive),
            s=sel(k_new.astype(f32), st.s),
            bnc=jnp.where(grant, zero, st.bnc),
            pix=sel(pix_new.astype(f32), st.pix),
            send=sel(k_new.astype(f32), st.send),
        )
        n_grant = jnp.minimum(jnp.sum(dead_i), navail)
        return st, counter + n_grant

    def unpack_texel(tex_u):
        r = (tex_u & 0xFF).astype(f32) * inv255
        g = ((tex_u >> 8) & 0xFF).astype(f32) * inv255
        b = ((tex_u >> 16) & 0xFF).astype(f32) * inv255
        return r, g, b

    def body(carry):
        st, counter, fb, iters = carry
        st, counter = refill(st, counter)
        out = step(tables, st)
        st = out.state
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = atlas_u32[idx.reshape(-1)].reshape(sh)
        txr, txg, txb = unpack_texel(texel)
        is_alb = out.fix_kind == WB.FIX_ALBEDO
        is_emit = out.fix_kind == WB.FIX_EMIT
        st = st._replace(
            tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
            tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
            tpz=jnp.where(is_alb, st.tpz * txb, st.tpz),
        )
        emit_r = jnp.where(is_emit, out.fwx * txr, 0.0)
        emit_g = jnp.where(is_emit, out.fwy * txg, 0.0)
        emit_b = jnp.where(is_emit, out.fwz * txb, 0.0)
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        vals = jnp.stack([st.accx.reshape(-1) + emit_r.reshape(-1),
                          st.accy.reshape(-1) + emit_g.reshape(-1),
                          st.accz.reshape(-1) + emit_b.reshape(-1)], axis=1)
        fb = fb.at[pix_i].add(vals)
        z = jnp.zeros_like(st.accx)
        st = st._replace(accx=z, accy=z, accz=z)
        return st, counter, fb, iters + 1

    st0 = WQ._zeros_state(rows)
    fb0 = jnp.zeros((n_pix, 3), f32)
    carry0 = (st0, jnp.int32(0), fb0, jnp.int32(0))

    body_jit = jax.jit(body)
    print(f"body jitted standalone:   {timeit(body_jit, carry0):.2f} ms")

    @jax.jit
    def loop20(carry):
        return jax.lax.fori_loop(0, 20, lambda i, c: body(c), carry)
    print(f"fori 20x body /iter:      {timeit(loop20, carry0) / 20:.2f} ms")

    @jax.jit
    def while20(carry):
        st, counter, fb, iters = carry
        def cond(c):
            return c[3] < 20
        return jax.lax.while_loop(cond, body, carry)
    print(f"while 20x body /iter:     {timeit(while20, carry0) / 20:.2f} ms")

    # the real thing for comparison
    from path_tracer_tpu.engine.wq import render_wq
    def run():
        img, segs, iters = render_wq(scene, cam, W, H, SPP, max_depth=DEPTH,
                                     return_stats=True)
        return img, float(jax.block_until_ready(segs)), int(iters)
    run()
    t0 = time.perf_counter()
    img, segs, iters = run()
    dt = time.perf_counter() - t0
    print(f"render_wq: {dt:.2f} s, iters={iters}, {dt/iters*1e3:.2f} ms/iter, "
          f"{segs/dt/1e6:.2f} Mray/s")


if __name__ == "__main__":
    main()
