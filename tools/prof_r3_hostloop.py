"""Probe the host-driven-loop design: gather/scatter are fast (DMA path)
only as program-level ops (prof_r3_fastgather.py: 0.02-0.05 ms standalone
vs 3.8-6.9 ms inside scan/while).  Time the REAL wq bounce body as ONE jit
called repeatedly from the host (async-pipelined over the axon tunnel),
vs the same body inside lax.scan, and measure per-dispatch overhead."""
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
    f32 = jnp.float32
    print(f"lanes={lanes}", flush=True)

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    tables = jax.device_put(tables)
    atlas_u32 = jax.device_put(atlas_u32)

    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    def body(tabs, au32, st, counter, fb):
        # --- refill (legacy one-bounce form, XLA camera rays) -------------
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
            send=sel(k_new.astype(f32), st.send))
        counter = counter + jnp.minimum(jnp.sum(dead_i), navail)
        # --- kernel ---------------------------------------------------------
        out = step(tabs, st)
        st = out.state
        # --- texel gather + fixup -------------------------------------------
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = au32[idx.reshape(-1)].reshape(sh)
        txr = (texel & 0xFF).astype(f32) / 255.0
        txg = ((texel >> 8) & 0xFF).astype(f32) / 255.0
        txb = ((texel >> 16) & 0xFF).astype(f32) / 255.0
        is_alb = out.fix_kind == f32(WB.FIX_ALBEDO)
        is_emit = out.fix_kind == f32(WB.FIX_EMIT)
        st = st._replace(
            tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
            tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
            tpz=jnp.where(is_alb, st.tpz * txb, st.tpz))
        emr = jnp.where(is_emit, out.fwx * txr, 0.0)
        emg = jnp.where(is_emit, out.fwy * txg, 0.0)
        emb = jnp.where(is_emit, out.fwz * txb, 0.0)
        # --- deposit: three scalar scatter-adds ------------------------------
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        fbr = fb[0].at[pix_i].add(st.accx.reshape(-1) + emr.reshape(-1))
        fbg = fb[1].at[pix_i].add(st.accy.reshape(-1) + emg.reshape(-1))
        fbb = fb[2].at[pix_i].add(st.accz.reshape(-1) + emb.reshape(-1))
        z = jnp.zeros_like(st.accx)
        st = st._replace(accx=z, accy=z, accz=z)
        return st, counter, (fbr, fbg, fbb)

    jbody = jax.jit(body)

    st0 = WQ._zeros_state(rows)
    fb0 = tuple(jnp.zeros((n_pix,), f32) for _ in range(3))
    c0 = jnp.int32(0)

    # warm & advance state a bit
    st, counter, fb = jbody(tables, atlas_u32, st0, c0, fb0)
    for _ in range(4):
        st, counter, fb = jbody(tables, atlas_u32, st, counter, fb)
    jax.block_until_ready(st.ox)

    # host loop of N bounces, async-pipelined
    for N in (16, 64):
        t0 = time.perf_counter()
        for _ in range(N):
            st, counter, fb = jbody(tables, atlas_u32, st, counter, fb)
        jax.block_until_ready(st.ox)
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"host-loop body x{N}: {dt:7.2f} ms/bounce", flush=True)

    # scalar sync cost: fetch counter every 16 bounces
    t0 = time.perf_counter()
    for i in range(32):
        st, counter, fb = jbody(tables, atlas_u32, st, counter, fb)
        if (i + 1) % 16 == 0:
            float(counter)
    dt = (time.perf_counter() - t0) / 32 * 1e3
    print(f"host-loop + sync/16:  {dt:7.2f} ms/bounce", flush=True)

    # reference: same body inside lax.scan (loop-context penalty)
    def scan8(st, counter, fb):
        def b(carry, _):
            st, counter, fb = carry
            st, counter, fb = body(tables, atlas_u32, st, counter, fb)
            return (st, counter, fb), None
        (st, counter, fb), _ = jax.lax.scan(b, (st, counter, fb), None,
                                            length=8)
        return st, counter, fb

    jscan = jax.jit(scan8)
    st, counter, fb = jscan(st, counter, fb)
    jax.block_until_ready(st.ox)
    t0 = time.perf_counter()
    for _ in range(4):
        st, counter, fb = jscan(st, counter, fb)
    jax.block_until_ready(st.ox)
    dt = (time.perf_counter() - t0) / 32 * 1e3
    print(f"scan(8) same body:    {dt:7.2f} ms/bounce", flush=True)


if __name__ == "__main__":
    main()
