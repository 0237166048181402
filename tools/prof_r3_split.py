"""Decomposed-dispatch probe: gather/scatter run at DMA speed only when
they are (nearly) the sole op of a program (prof_r3_fastgather.py:
standalone take = 0.045 ms, scatter = 0.021 ms; the same ops cost 3.8/6.9
ms when compiled into a larger program — prof_r3_hostloop.py shows the
host-loop-of-one-big-jit is exactly as slow as scan).  Measure:

  1. per-dispatch overhead of tiny jits over the axon tunnel
  2. a 4-program bounce pipeline: [refill+kernel+fixprep] -> [take] ->
     [fixup dense + deposit prep] -> [one scatter-add]
"""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50
LANE = 128
TILE_ROWS = 32


def main():
    scene, cam = build_final_scene(W / H)
    n_pix = W * H
    total = n_pix * SPP
    quantum = TILE_ROWS * LANE
    lanes = WQ._round_up(min(n_pix, total), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    L = lanes
    f32 = jnp.float32
    print(f"lanes={lanes}", flush=True)

    # ---- 1. dispatch overhead ------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), f32)
    x = tiny(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(256):
        x = tiny(x)
    jax.block_until_ready(x)
    print(f"tiny-jit dispatch: {(time.perf_counter()-t0)/256*1e3:.3f} "
          f"ms/call (256 chained)", flush=True)

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = jax.device_put(a32[:, 0] | (a32[:, 1] << 8)
                               | (a32[:, 2] << 16))
    tables = jax.device_put(tables)

    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    @jax.jit
    def prog_a(tabs, st, counter):
        """refill + kernel + fix-index prep (flat i32)."""
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
            ^ rng_mod.splitmix32(k_new.astype(jnp.uint32) ^ tabs.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
        grant = grant_f.reshape(sh)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
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
            send=sel(k_new.astype(f32), st.send))
        counter = counter + jnp.minimum(jnp.sum(dead_i), navail)
        out = step(tabs, st)
        idx = jnp.clip(out.fix_idx.astype(jnp.int32),
                       0, n_atlas - 1).reshape(-1)
        return out, counter, idx

    take = jax.jit(lambda tab, idx: tab[idx])

    @jax.jit
    def prog_c(out, texel_flat):
        """texel fixup + deposit prep: one (3L,) value vector + (3L,) idx"""
        st = out.state
        texel = texel_flat.reshape(sh)
        txr = (texel & 0xFF).astype(f32) / 255.0
        txg = ((texel >> 8) & 0xFF).astype(f32) / 255.0
        txb = ((texel >> 16) & 0xFF).astype(f32) / 255.0
        is_alb = out.fix_kind == f32(WB.FIX_ALBEDO)
        is_emit = out.fix_kind == f32(WB.FIX_EMIT)
        st = st._replace(
            tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
            tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
            tpz=jnp.where(is_alb, st.tpz * txb, st.tpz))
        vr = st.accx + jnp.where(is_emit, out.fwx * txr, 0.0)
        vg = st.accy + jnp.where(is_emit, out.fwy * txg, 0.0)
        vb = st.accz + jnp.where(is_emit, out.fwz * txb, 0.0)
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        dep_idx = jnp.concatenate(
            [pix_i, pix_i + n_pix, pix_i + 2 * n_pix])
        dep_val = jnp.concatenate(
            [vr.reshape(-1), vg.reshape(-1), vb.reshape(-1)])
        z = jnp.zeros_like(st.accx)
        st = st._replace(accx=z, accy=z, accz=z)
        return st, dep_idx, dep_val

    scatter = jax.jit(lambda fb, i, v: fb.at[i].add(v))

    st = WQ._zeros_state(rows)
    fb = jnp.zeros((3 * n_pix,), f32)
    counter = jnp.int32(0)

    def bounce(st, counter, fb):
        out, counter, idx = prog_a(tables, st, counter)
        texel = take(atlas_u32, idx)
        st, dep_idx, dep_val = prog_c(out, texel)
        fb = scatter(fb, dep_idx, dep_val)
        return st, counter, fb

    # warm
    for _ in range(5):
        st, counter, fb = bounce(st, counter, fb)
    jax.block_until_ready(st.ox)

    for N in (16, 64):
        t0 = time.perf_counter()
        for _ in range(N):
            st, counter, fb = bounce(st, counter, fb)
        jax.block_until_ready(st.ox)
        print(f"4-program bounce x{N}: "
              f"{(time.perf_counter()-t0)/N*1e3:7.2f} ms/bounce", flush=True)

    # individual program costs (chained on themselves where possible)
    out, counter2, idx = prog_a(tables, st, counter)
    jax.block_until_ready(idx)
    t0 = time.perf_counter()
    for _ in range(16):
        out, _, idx = prog_a(tables, st, counter)
    jax.block_until_ready(idx)
    print(f"prog_a (refill+kernel): {(time.perf_counter()-t0)/16*1e3:7.2f} ms",
          flush=True)
    texel = take(atlas_u32, idx)
    jax.block_until_ready(texel)
    t0 = time.perf_counter()
    for _ in range(16):
        texel = take(atlas_u32, idx)
    jax.block_until_ready(texel)
    print(f"take alone:             {(time.perf_counter()-t0)/16*1e3:7.2f} ms",
          flush=True)
    st2, dep_idx, dep_val = prog_c(out, texel)
    jax.block_until_ready(dep_val)
    t0 = time.perf_counter()
    for _ in range(16):
        _, dep_idx, dep_val = prog_c(out, texel)
    jax.block_until_ready(dep_val)
    print(f"prog_c (fixup+prep):    {(time.perf_counter()-t0)/16*1e3:7.2f} ms",
          flush=True)
    fb2 = scatter(fb, dep_idx, dep_val)
    jax.block_until_ready(fb2)
    t0 = time.perf_counter()
    for _ in range(16):
        fb2 = scatter(fb2, dep_idx, dep_val)
    jax.block_until_ready(fb2)
    print(f"scatter alone:          {(time.perf_counter()-t0)/16*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
