"""B-bounce work-queue renderer — drives ops.pallas.wq_kernel.

This is the round-3 evolution of engine/wq.py: the global sample queue now
lives INSIDE the megakernel, which traces B segments per dispatch, so the
per-segment XLA glue that dominated the one-bounce driver (refill cumsums
and 20-array grant merges ~3 ms, atlas gather ~3 ms, framebuffer
scatter-add ~13 ms — tools/prof_wq_body*.py, v5e, 483K lanes vs 7.7 ms of
kernel) is paid once per B segments.  Remaining per-call XLA:

1. **stall resolution**: gather the <=3 pending atlas texels of stalled
   lanes, multiply into the terminal contribution (kind 1: sample ended) or
   the throughput (kind 2: segment rewound), clear the stall;
2. **chunk deposit**: one scatter-add of at most one completed
   (pixel-chunk, rgb) per lane;
3. the while-loop condition on the queue's SMEM counters.

Work order: chunks of C consecutive samples (C | spp) of one pixel,
pixel-major, so results are a pure function of (pixel, sample) — identical
streams to engine/wq.py (core.rng.seed_perf) — and independent of lane
scheduling up to f32 deposit reassociation.  Reference semantics:
render.hpp:95-101 sample loop, render.hpp:25-92 integrator.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB
from ..ops.pallas import wq_kernel as WQ

LANE = WQ.LANE
DEF_TILE_ROWS = 32
MAX_CHUNK = 16


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pick_chunk(spp: int, cap: int = MAX_CHUNK) -> int:
    """Largest divisor of spp that is <= cap (the deposit amortization
    factor; also the number of in-kernel bounces per dispatch)."""
    for c in range(min(cap, spp), 0, -1):
        if spp % c == 0:
            return c
    return 1


def _zeros_state(rows: int) -> WQ.WqState:
    f32 = jnp.float32
    sh = (rows, LANE)
    z = jnp.zeros(sh, f32)
    return WQ.WqState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=z, tm=z,
        rng=jnp.zeros(sh, jnp.uint32),
        tpx=z, tpy=z, tpz=z, accx=z, accy=z, accz=z,
        alive=z, s=z, pix=z, bnc=z, wrk=z, stall=z,
        pf1=z, pf2=z, pf3=z, trx=z, tr_y=z, trz=z,
        pk1=z, pk2=z, pk3=z, pk4=z,
        pkr1=z, pkr2=z, pkr3=z, pkr4=z,
        pkg1=z, pkg2=z, pkg3=z, pkg4=z,
        pkb1=z, pkb2=z, pkb3=z, pkb4=z)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _render_wq2_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                    spp: int, max_depth: int, attenuate: bool, t_min: float,
                    tile_rows: int, interpret: bool, seed: jnp.ndarray):
    n_pix = width * height
    total = n_pix * spp
    assert total < 2 ** 31
    C = pick_chunk(spp)
    cpp = spp // C
    n_chunks = n_pix * cpp
    quantum = tile_rows * LANE
    lanes = _round_up(min(n_pix, total), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, width, height),
                             seed=seed.reshape(1).astype(jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    inv255 = f32(1.0 / 255.0)

    call = functools.partial(
        WQ.wq_call, t_min=t_min, max_depth=max_depth, attenuate=attenuate,
        n_bounce=C, chunk=C, cpp=cpp, tile_rows=tile_rows,
        interpret=interpret)

    def texel_factor(pf):
        """(r, g, b) factor for one pending slot; 1 where empty."""
        idx = jnp.clip(pf.astype(jnp.int32) - 1, 0, n_atlas - 1)
        t = atlas_u32[idx.reshape(-1)].reshape(sh)
        has = pf > 0.0
        fr = jnp.where(has, (t & 0xFF).astype(f32) * inv255, 1.0)
        fg = jnp.where(has, ((t >> 8) & 0xFF).astype(f32) * inv255, 1.0)
        fb_ = jnp.where(has, ((t >> 16) & 0xFF).astype(f32) * inv255, 1.0)
        return fr, fg, fb_

    def body(carry):
        st, qs, fbr, fbg, fbb, calls = carry
        out = call(tables, st, qs)
        st, qs = out.state, out.qstate

        # chunk deposit: at most one completed chunk per lane per call
        di = jnp.where(out.dpix >= 0.0, out.dpix, f32(n_pix)).astype(
            jnp.int32).reshape(-1)
        fbr = fbr.at[di].add(out.dr.reshape(-1), mode="drop")
        fbg = fbg.at[di].add(out.dg.reshape(-1), mode="drop")
        fbb = fbb.at[di].add(out.db.reshape(-1), mode="drop")

        # parked single-texel sample terminals: acc += term * texel
        ax, ay, az = st.accx, st.accy, st.accz
        for pk, tr, tg, tb in ((st.pk1, st.pkr1, st.pkg1, st.pkb1),
                               (st.pk2, st.pkr2, st.pkg2, st.pkb2),
                               (st.pk3, st.pkr3, st.pkg3, st.pkb3),
                               (st.pk4, st.pkr4, st.pkg4, st.pkb4)):
            kr, kg, kb = texel_factor(pk)
            has = pk > 0.0
            ax = ax + jnp.where(has, tr * kr, 0.0)
            ay = ay + jnp.where(has, tg * kg, 0.0)
            az = az + jnp.where(has, tb * kb, 0.0)
        z = jnp.zeros_like(st.pk1)

        # stall resolution: texel product of the pending slots
        any_stall = st.stall != 0.0
        f1 = texel_factor(st.pf1)
        f2 = texel_factor(st.pf2)
        f3 = texel_factor(st.pf3)
        pr = f1[0] * f2[0] * f3[0]
        pg = f1[1] * f2[1] * f3[1]
        pb = f1[2] * f2[2] * f3[2]
        is1 = st.stall == WQ.ST_TERM
        is2 = st.stall == WQ.ST_REWIND
        st = st._replace(
            accx=jnp.where(is1, ax + st.trx * pr, ax),
            accy=jnp.where(is1, ay + st.tr_y * pg, ay),
            accz=jnp.where(is1, az + st.trz * pb, az),
            tpx=jnp.where(is2, st.tpx * pr, st.tpx),
            tpy=jnp.where(is2, st.tpy * pg, st.tpy),
            tpz=jnp.where(is2, st.tpz * pb, st.tpz),
            pf1=jnp.where(any_stall, 0.0, st.pf1),
            pf2=jnp.where(any_stall, 0.0, st.pf2),
            pf3=jnp.where(any_stall, 0.0, st.pf3),
            stall=jnp.zeros_like(st.stall),
            pk1=z, pk2=z, pk3=z, pk4=z)
        return st, qs, fbr, fbg, fbb, calls + 1

    def cond(carry):
        st, qs, fbr, fbg, fbb, calls = carry
        return (qs[2] > 0) | (qs[3] > 0)

    st0 = _zeros_state(rows)
    qs0 = jnp.array([0, 0, n_chunks, 0], jnp.int32)
    fb0 = jnp.zeros((n_pix + 1,), f32)  # +1 = drop slot for empty done slots
    st, qs, fbr, fbg, fbb, calls = jax.lax.while_loop(
        cond, body, (st0, qs0, fb0, fb0, fb0, jnp.int32(0)))

    # residual flush: chunks that finished but were never re-granted keep
    # their radiance in acc (incl. never-completed tails); one scatter.
    pix_i = jnp.clip(st.pix.astype(jnp.int32), 0, n_pix).reshape(-1)
    fbr = fbr.at[pix_i].add(st.accx.reshape(-1), mode="drop")
    fbg = fbg.at[pix_i].add(st.accy.reshape(-1), mode="drop")
    fbb = fbb.at[pix_i].add(st.accz.reshape(-1), mode="drop")

    img = jnp.stack([fbr[:n_pix], fbg[:n_pix], fbb[:n_pix]], axis=1)
    img = (img / f32(spp)).reshape(height, width, 3)
    segs = jnp.sum(st.wrk)
    return img, segs, calls * jnp.int32(C)


def render_wq2(scene: T.Scene, cam: Camera, width: int, height: int,
               spp: int, max_depth: int = 50,
               attenuate_emission: bool = False, t_min: float = 1e-3,
               seed: int = 0, tile_rows: Optional[int] = None,
               interpret: Optional[bool] = None,
               return_stats: bool = False):
    """Render with the B-bounce in-kernel-queue megakernel.  Output
    (H, W, 3), fb row 0 = image bottom (flip at save, main.cpp:41)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = DEF_TILE_ROWS if not interpret else 8
    img, segs, iters = _render_wq2_jit(
        scene, cam, width, height, spp, max_depth,
        bool(attenuate_emission), float(t_min), int(tile_rows),
        bool(interpret), jnp.uint32(seed))
    if return_stats:
        return img, segs, iters
    return img
