"""Bisect the fused wq body: find which combination of stages explodes."""
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

    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    st0 = WQ._zeros_state(rows)
    st0 = st0._replace(alive=jnp.ones(sh, f32),
                       rng=jnp.full(sh, 12345, jnp.uint32),
                       dy=jnp.full(sh, -0.5, f32), dx=jnp.ones(sh, f32),
                       oy=jnp.full(sh, 2.0, f32))
    fb0 = jnp.zeros((n_pix, 3), f32)

    def refill_only(st, counter):
        dead = st.alive <= 0.0
        dead_i = dead.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i
        navail = total - counter
        sid = counter + rank
        pix_new = sid // SPP
        k_new = sid - pix_new * SPP
        rng0 = rng_mod.splitmix32(
            pix_new.astype(jnp.uint32)
            ^ rng_mod.splitmix32(k_new.astype(jnp.uint32) ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
        grant = (dead.reshape(-1) & (rank < navail)).reshape(sh)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        st = st._replace(
            ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
            dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
            tm=sel(tmv, st.tm),
            rng=jnp.where(grant, rng1.reshape(sh), st.rng),
            alive=jnp.where(grant, 1.0, st.alive),
            s=sel(k_new.astype(f32), st.s),
            pix=sel(pix_new.astype(f32), st.pix),
            send=sel(k_new.astype(f32), st.send))
        n_grant = jnp.minimum(jnp.sum(dead_i), navail)
        return st, counter + n_grant

    # A: refill alone
    fA = jax.jit(lambda st, c: refill_only(st, c))
    print(f"A refill alone:           {timeit(fA, st0, jnp.int32(0)):.2f} ms")

    # B: kernel alone
    fB = jax.jit(lambda st: step(tables, st))
    print(f"B kernel alone:           {timeit(fB, st0):.2f} ms")

    # C: refill + kernel
    @jax.jit
    def fC(st, c):
        st, c = refill_only(st, c)
        return step(tables, st), c
    print(f"C refill+kernel:          {timeit(fC, st0, jnp.int32(0)):.2f} ms")

    # D: kernel + gather fix
    @jax.jit
    def fD(st):
        out = step(tables, st)
        st = out.state
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = atlas_u32[idx.reshape(-1)].reshape(sh)
        txr = (texel & 0xFF).astype(f32)
        is_alb = out.fix_kind == WB.FIX_ALBEDO
        return st._replace(tpx=jnp.where(is_alb, st.tpx * txr, st.tpx))
    print(f"D kernel+gather:          {timeit(fD, st0):.2f} ms")

    # E: kernel + scatter
    @jax.jit
    def fE(st, fb):
        out = step(tables, st)
        st = out.state
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        vals = jnp.stack([st.accx.reshape(-1), st.accy.reshape(-1),
                          st.accz.reshape(-1)], axis=1)
        return fb.at[pix_i].add(vals)
    print(f"E kernel+scatter:         {timeit(fE, st0, fb0):.2f} ms")

    # F: scatter taking kernel OUTPUT as input (pre-computed)
    out0 = fB(st0)
    @jax.jit
    def fF(st, fb):
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        vals = jnp.stack([st.accx.reshape(-1), st.accy.reshape(-1),
                          st.accz.reshape(-1)], axis=1)
        return fb.at[pix_i].add(vals)
    print(f"F scatter on kernel out:  {timeit(fF, out0.state, fb0):.2f} ms")

    # G: refill + kernel + gather + scatter (full, no donation)
    @jax.jit
    def fG(st, c, fb):
        st, c = refill_only(st, c)
        out = step(tables, st)
        st = out.state
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = atlas_u32[idx.reshape(-1)].reshape(sh)
        txr = (texel & 0xFF).astype(f32)
        is_alb = out.fix_kind == WB.FIX_ALBEDO
        st = st._replace(tpx=jnp.where(is_alb, st.tpx * txr, st.tpx))
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        vals = jnp.stack([st.accx.reshape(-1), st.accy.reshape(-1),
                          st.accz.reshape(-1)], axis=1)
        return st, c, fb.at[pix_i].add(vals)
    print(f"G full body:              {timeit(fG, st0, jnp.int32(0), fb0):.2f} ms")


if __name__ == "__main__":
    main()
