"""Deposit/gather/refill formulation variants for the wq loop, in-loop."""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.engine.wq import _zeros_state, _round_up, LANE

W, H, SPP = 800, 600, 80
TILE = 32
scene, cam = build_final_scene(W / H)
n_pix = W * H
total = n_pix * SPP
lanes = _round_up(n_pix, TILE * LANE)
rows = lanes // LANE
sh = (rows, LANE)
f32 = jnp.float32

tables = WB.pack_scene(scene)
tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                         seed=jnp.zeros(1, jnp.uint32))
atlas = scene.textures.atlas
n_atlas = atlas.shape[0]
a32 = atlas.astype(jnp.uint32)
atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)

step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=50,
                         attenuate=False, tile_rows=TILE, interpret=False)


def refill_v1(st, counter):
    dead = st.alive <= 0.0
    dead_i = dead.reshape(-1).astype(jnp.int32)
    rank = jnp.cumsum(dead_i) - dead_i
    navail = total - counter
    grant_f = dead.reshape(-1) & (rank < navail)
    sid = counter + rank
    pix_new = sid // SPP
    k_new = sid - pix_new * SPP
    rng0 = rng_mod.splitmix32(pix_new.astype(jnp.uint32)
                              ^ rng_mod.splitmix32(k_new.astype(jnp.uint32)))
    rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
    rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
    grant = grant_f.reshape(sh)
    sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
    one = f32(1.0); zero = f32(0.0)
    st = st._replace(
        ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
        dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
        tm=sel(tmv, st.tm), rng=jnp.where(grant, rng1.reshape(sh), st.rng),
        tpx=jnp.where(grant, one, st.tpx),
        tpy=jnp.where(grant, one, st.tpy),
        tpz=jnp.where(grant, one, st.tpz),
        radx=jnp.where(grant, zero, st.radx),
        rady=jnp.where(grant, zero, st.rady),
        radz=jnp.where(grant, zero, st.radz),
        alive=jnp.where(grant, one, st.alive),
        s=sel(k_new.astype(f32), st.s), bnc=jnp.where(grant, zero, st.bnc),
        pix=sel(pix_new.astype(f32), st.pix),
        send=sel(k_new.astype(f32), st.send))
    return st, counter + jnp.minimum(jnp.sum(dead_i), navail)


def refill_v2(st, counter):
    """2D cumsum (lane-dim then sublane-dim), f32 exact div/mod, no flat
    relayouts."""
    dead = st.alive <= 0.0
    di = dead.astype(jnp.int32)
    row_in = jnp.cumsum(di, axis=1)                 # inclusive along lanes
    row_tot = row_in[:, -1:]
    row_off = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive along rows
    rank = row_off + row_in - di                    # exclusive global rank
    navail = total - counter
    grant = dead & (rank < navail)
    sid = counter + rank
    # pix = sid // SPP exactly: f32 divide + i32 correction
    q0 = jnp.floor(sid.astype(f32) * f32(1.0 / SPP)).astype(jnp.int32)
    r0 = sid - q0 * SPP
    q1 = q0 + (r0 >= SPP).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)
    r1 = sid - q1 * SPP
    q = q1 + (r1 >= SPP).astype(jnp.int32) - (r1 < 0).astype(jnp.int32)
    pix_new = q
    k_new = sid - q * SPP
    rng0 = rng_mod.splitmix32(pix_new.astype(jnp.uint32)
                              ^ rng_mod.splitmix32(k_new.astype(jnp.uint32)))
    rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
    rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
    one = f32(1.0); zero = f32(0.0)
    sel = lambda new, old: jnp.where(grant, new, old)
    st = st._replace(
        ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
        dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
        tm=sel(tmv, st.tm), rng=jnp.where(grant, rng1, st.rng),
        tpx=jnp.where(grant, one, st.tpx),
        tpy=jnp.where(grant, one, st.tpy),
        tpz=jnp.where(grant, one, st.tpz),
        radx=jnp.where(grant, zero, st.radx),
        rady=jnp.where(grant, zero, st.rady),
        radz=jnp.where(grant, zero, st.radz),
        alive=jnp.where(grant, one, st.alive),
        s=sel(k_new.astype(f32), st.s), bnc=jnp.where(grant, zero, st.bnc),
        pix=sel(pix_new.astype(f32), st.pix),
        send=sel(k_new.astype(f32), st.send))
    return st, counter + jnp.minimum(jnp.sum(di), navail)


def deposit_v2(st, fbr, fbg, fbb):
    """3 planar scalar scatters, no (N, 3) stack."""
    pix_i = st.pix.reshape(-1).astype(jnp.int32)
    fbr = fbr.at[pix_i].add(st.accx.reshape(-1))
    fbg = fbg.at[pix_i].add(st.accy.reshape(-1))
    fbb = fbb.at[pix_i].add(st.accz.reshape(-1))
    z = jnp.zeros_like(st.accx)
    return st._replace(accx=z, accy=z, accz=z), fbr, fbg, fbb


def gather_v2(out, st):
    """take with 2D idx, unpack in tiled layout."""
    idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
    texel = jnp.take(atlas_u32, idx, axis=0)
    inv255 = f32(1.0 / 255.0)
    txr = (texel & 0xFF).astype(f32) * inv255
    txg = ((texel >> 8) & 0xFF).astype(f32) * inv255
    txb = ((texel >> 16) & 0xFF).astype(f32) * inv255
    is_alb = out.fix_kind == WB.FIX_ALBEDO
    is_emit = out.fix_kind == WB.FIX_EMIT
    st = st._replace(tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
                     tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
                     tpz=jnp.where(is_alb, st.tpz * txb, st.tpz))
    er = jnp.where(is_emit, out.fwx * txr, 0.0)
    eg = jnp.where(is_emit, out.fwy * txg, 0.0)
    eb = jnp.where(is_emit, out.fwz * txb, 0.0)
    return st, (er, eg, eb)


def make(variant):
    @jax.jit
    def f(st, counter, fbr, fbg, fbb):
        def body(i, c):
            st, counter, fbr, fbg, fbb = c
            if "r2" in variant:
                st, counter = refill_v2(st, counter)
            elif "r1" in variant:
                st, counter = refill_v1(st, counter)
            out = step(tables, st)
            st = out.state
            if "g2" in variant:
                st, (er, eg, eb) = gather_v2(out, st)
                st = st._replace(accx=st.accx + er, accy=st.accy + eg,
                                 accz=st.accz + eb)
            if "d2" in variant:
                st, fbr, fbg, fbb = deposit_v2(st, fbr, fbg, fbb)
            return st, counter, fbr, fbg, fbb
        return jax.lax.fori_loop(0, 10, body, (st, counter, fbr, fbg, fbb))
    return f


def bench(fn, *a):
    r = fn(*a); jax.block_until_ready(r[2])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*a); jax.block_until_ready(r[2])
        best = min(best, time.perf_counter() - t0)
    return best / 10


st0 = _zeros_state(rows)
fb0 = jnp.zeros((n_pix,), f32)
import sys
variants = sys.argv[1:] or ["r1-d2", "r2-d2", "r2-g2-d2"]
for v in variants:
    t = bench(make(v), st0, jnp.int32(0), fb0, fb0, fb0)
    print(f"variant '{v}': {t*1e3:.2f} ms/step", flush=True)
