"""Pallas TPU B-bounce work-queue megakernel.

One `pallas_call` advances every lane through **B path segments**, with the
global sample queue INSIDE the kernel: dead lanes are refilled each segment
from SMEM chunk counters shared across the (sequential) grid programs, so
the per-bounce XLA glue of the one-bounce driver (engine/wq.py round 2 —
refill cumsums, grant merges over 20 state arrays, per-bounce framebuffer
scatter: measured 3 + 11-20 ms per 483K-lane step vs 7.7 ms of kernel) is
paid once per B segments instead of once per segment.

Design (reference workload: render.hpp:95-101 sample loop over
camera.hpp:93-100 rays):

* **Chunked grants.** The queue hands out chunks of C consecutive samples
  of ONE pixel (sample ids pix*spp + [kc, kc+C)); C | spp.  A lane
  accumulates the chunk's radiance in a per-lane `acc` register, so the
  framebuffer deposit happens once per chunk, not once per sample.  Since
  every sample costs >= 1 segment, a chunk lives >= C segments, and with
  B <= C at most ONE chunk can complete per lane per call — the completed
  chunk's (pixel, rgb) ride out in a single "done slot" per lane, and the
  driver's scatter-add runs once per call (TPU scatter costs ~27 ns/row —
  tools/prof_wq_body*.py — so per-segment scatters dominate everything).
* **In-kernel refill.** Dead-lane ranking uses two MXU matmuls against
  iota-built strict-triangular matrices (exclusive prefix over the row-major
  lane order); chunk ids decode to (pixel, k0) with exact-f32 arithmetic
  (quotients < 2^24 by construction).  Queue head lives in SMEM scratch,
  persisting across the grid; call-to-call it travels through a tiny SMEM
  in/out pair.
* **Pending texture fixups.** Image-texture albedo multiplies are DEFERRED:
  up to 3 atlas indices per lane ride in `pf1..pf3` (all radiance in this
  integrator is terminal — sky or emission at path end, render.hpp:58-91 —
  so texel factors commute into the final contribution).  A lane whose
  sample terminates with pendings **stalls** (kind 1) and the driver
  resolves texels outside; a lane whose pendings would overflow **rewinds**
  its segment (kind 2: pre-segment state restored) and retries next call
  with cleared pendings.  Stalled lanes idle for the rest of the call
  (<2 %% of samples touch image textures in the reference scene).

The per-segment pipeline itself is `bounce_core.advance` — identical math
and RNG draw accounting to the one-bounce kernel, so per-(pixel, sample)
results match `engine.wq.render_wq` bit-for-bit modulo the f32 order of
framebuffer accumulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bounce_core import LANE, advance, camera_ray_block
from .wave_bounce import SceneTables  # noqa: F401  (re-exported for drivers)

DEF_TILE_ROWS = 32

# stall codes
ST_NONE = 0.0
ST_TERM = 1.0    # sample ended; acc += term * prod(texel(pf*)) outside
ST_REWIND = 2.0  # segment rewound; tp *= prod(texel(pf*)) outside, retry


N_PARK = 4


class WqState(NamedTuple):
    """Per-lane state, all (rows, 128) f32 except rng (u32)."""
    ox: jnp.ndarray; oy: jnp.ndarray; oz: jnp.ndarray
    dx: jnp.ndarray; dy: jnp.ndarray; dz: jnp.ndarray
    tm: jnp.ndarray
    rng: jnp.ndarray
    tpx: jnp.ndarray; tpy: jnp.ndarray; tpz: jnp.ndarray
    accx: jnp.ndarray; accy: jnp.ndarray; accz: jnp.ndarray
    alive: jnp.ndarray
    s: jnp.ndarray          # current sample index within the pixel
    pix: jnp.ndarray
    bnc: jnp.ndarray
    wrk: jnp.ndarray        # segments traced (stats)
    stall: jnp.ndarray      # ST_*
    pf1: jnp.ndarray; pf2: jnp.ndarray; pf3: jnp.ndarray  # atlas idx + 1
    trx: jnp.ndarray; tr_y: jnp.ndarray; trz: jnp.ndarray  # stall-1 term
    # park slots: a sample that ENDED with exactly one pending texel parks
    # its (texel index + 1, term rgb) here and the lane moves on to the
    # next sample immediately; the driver resolves acc += term * texel(pk)
    # after the call.  Slots full (or multi-texel pendings) -> stall-1.
    pk1: jnp.ndarray; pk2: jnp.ndarray; pk3: jnp.ndarray; pk4: jnp.ndarray
    pkr1: jnp.ndarray; pkr2: jnp.ndarray; pkr3: jnp.ndarray; pkr4: jnp.ndarray
    pkg1: jnp.ndarray; pkg2: jnp.ndarray; pkg3: jnp.ndarray; pkg4: jnp.ndarray
    pkb1: jnp.ndarray; pkb2: jnp.ndarray; pkb3: jnp.ndarray; pkb4: jnp.ndarray


N_STATE = 42


class WqOut(NamedTuple):
    state: WqState
    dpix: jnp.ndarray       # completed chunk's pixel, -1 if none
    dr: jnp.ndarray; dg: jnp.ndarray; db: jnp.ndarray
    qstate: jnp.ndarray     # (4,) i32: pix0, cc0, rem, n_active


def _rank_dead(d):
    """Exclusive row-major prefix count of d (f32 0/1, (tile,128)) via MXU
    matmuls against iota triangulars (Mosaic has no cumsum)."""
    t = d.shape[0]
    jl = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    kl = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    U = (jl < kl).astype(jnp.float32)
    O = jnp.ones((LANE, LANE), jnp.float32)
    jr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    L = (kr < jr).astype(jnp.float32)
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return mm(d, U) + mm(L, mm(d, O))


def _wq_kernel(# SMEM ins
               sph, sph_segs, rect, rect_segs, tri, tri_segs, med, spec,
               cam, seed, qstate_in,
               # VMEM state ins (WqState order)
               i_ox, i_oy, i_oz, i_dx, i_dy, i_dz, i_tm, i_rng,
               i_tpx, i_tpy, i_tpz, i_accx, i_accy, i_accz,
               i_alive, i_s, i_pix, i_bnc, i_wrk, i_stall,
               i_pf1, i_pf2, i_pf3, i_trx, i_try, i_trz,
               i_pk1, i_pk2, i_pk3, i_pk4,
               i_pkr1, i_pkr2, i_pkr3, i_pkr4,
               i_pkg1, i_pkg2, i_pkg3, i_pkg4,
               i_pkb1, i_pkb2, i_pkb3, i_pkb4,
               # outs
               o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_tm, o_rng,
               o_tpx, o_tpy, o_tpz, o_accx, o_accy, o_accz,
               o_alive, o_s, o_pix, o_bnc, o_wrk, o_stall,
               o_pf1, o_pf2, o_pf3, o_trx, o_try, o_trz,
               o_pk1, o_pk2, o_pk3, o_pk4,
               o_pkr1, o_pkr2, o_pkr3, o_pkr4,
               o_pkg1, o_pkg2, o_pkg3, o_pkg4,
               o_pkb1, o_pkb2, o_pkb3, o_pkb4,
               o_dpix, o_dr, o_dg, o_db, qstate_out,
               # scratch
               q,
               *, n_med: int, t_min: float, max_depth: int,
               attenuate: bool, n_bounce: int, chunk: int, cpp: int):
    f32 = jnp.float32
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(pid == 0)
    def _():
        q[0] = qstate_in[0]
        q[1] = qstate_in[1]
        q[2] = qstate_in[2]
        q[3] = jnp.int32(0)

    st = (i_ox[:, :], i_oy[:, :], i_oz[:, :], i_dx[:, :], i_dy[:, :],
          i_dz[:, :], i_tm[:, :], i_rng[:, :], i_tpx[:, :], i_tpy[:, :],
          i_tpz[:, :], i_accx[:, :], i_accy[:, :], i_accz[:, :],
          i_alive[:, :], i_s[:, :], i_pix[:, :], i_bnc[:, :], i_wrk[:, :],
          i_stall[:, :], i_pf1[:, :], i_pf2[:, :], i_pf3[:, :],
          i_trx[:, :], i_try[:, :], i_trz[:, :],
          i_pk1[:, :], i_pk2[:, :], i_pk3[:, :], i_pk4[:, :],
          i_pkr1[:, :], i_pkr2[:, :], i_pkr3[:, :], i_pkr4[:, :],
          i_pkg1[:, :], i_pkg2[:, :], i_pkg3[:, :], i_pkg4[:, :],
          i_pkb1[:, :], i_pkb2[:, :], i_pkb3[:, :], i_pkb4[:, :])
    zero = jnp.zeros_like(st[0])
    one = zero + 1.0
    dpix0 = zero - 1.0
    Cf = f32(chunk)
    cppf = f32(cpp)

    def body(_, carry):
        (ox, oy, oz, dx, dy, dz, tm, rng, tpx, tpy, tpz,
         accx, accy, accz, alive, s, pix, bnc, wrk, stall,
         pf1, pf2, pf3, trx, try_, trz,
         pk1, pk2, pk3, pk4, pkr1, pkr2, pkr3, pkr4,
         pkg1, pkg2, pkg3, pkg4, pkb1, pkb2, pkb3, pkb4,
         dpix, dr, dg, db) = carry

        # ---------------- refill from the queue --------------------------
        not_stalled = stall == f32(ST_NONE)
        dead = (alive <= 0.0) & not_stalled
        schunk = jnp.floor(s * (1.0 / Cf))
        in_chunk = (s - schunk * Cf) != 0.0      # mid-chunk sample pending
        local = dead & in_chunk
        # a chunk with parked pendings can't be closed out yet: its acc is
        # incomplete until the driver resolves the parks (slots fill 1->4,
        # so slot 1 empty == all empty)
        cand = dead & jnp.logical_not(in_chunk) & (pk1 == 0.0)
        cand_f = jnp.where(cand, 1.0, 0.0)
        rem = q[2]
        rem_f = rem.astype(f32)
        rank = _rank_dead(cand_f)
        grant = cand & (rank < rem_f)
        # chunk id decode: (pix0, cc0) + rank, exact in f32 (rank < 4096+cpp)
        cc0_f = q[1].astype(f32)
        totc = cc0_f + rank
        dpixq = jnp.floor(totc * (1.0 / cppf))
        # guard fp: floor(t/cpp) via multiply can be off by one ulp at exact
        # multiples; correct with a compare against the reconstruction
        dpixq = jnp.where((dpixq + 1.0) * cppf <= totc, dpixq + 1.0, dpixq)
        dpixq = jnp.where(dpixq * cppf > totc, dpixq - 1.0, dpixq)
        pixq = q[0].astype(f32) + dpixq
        kq = (totc - dpixq * cppf) * Cf
        # completed chunk -> done slot (at most one grant per lane per call)
        dpix = jnp.where(grant, pix, dpix)
        dr = jnp.where(grant, accx, dr)
        dg = jnp.where(grant, accy, dg)
        db = jnp.where(grant, accz, db)
        accx = jnp.where(grant, 0.0, accx)
        accy = jnp.where(grant, 0.0, accy)
        accz = jnp.where(grant, 0.0, accz)
        pix = jnp.where(grant, pixq, pix)
        s = jnp.where(grant, kq, s)
        # advance the queue head (scalar, exact: tot < cpp + lanes)
        n_cand = jnp.sum(cand_f).astype(jnp.int32)
        g = jnp.minimum(n_cand, rem)
        tot = q[1] + g
        tot_f = tot.astype(f32)
        dp0 = jnp.floor(tot_f * (1.0 / cppf))
        dp0 = jnp.where((dp0 + 1.0) * cppf <= tot_f, dp0 + 1.0, dp0)
        dp0 = jnp.where(dp0 * cppf > tot_f, dp0 - 1.0, dp0)
        dp0i = dp0.astype(jnp.int32)
        q[0] = q[0] + dp0i
        q[1] = tot - dp0i * jnp.int32(cpp)
        q[2] = rem - g

        regen = grant | local
        (rng, cox, coy, coz, cdx, cdy, cdz, ctime) = camera_ray_block(
            cam, pix, s, seed[0], regen, rng)
        sel = lambda new, old: jnp.where(regen, new, old)
        ox = sel(cox, ox); oy = sel(coy, oy); oz = sel(coz, oz)
        dx = sel(cdx, dx); dy = sel(cdy, dy); dz = sel(cdz, dz)
        tm = sel(ctime, tm)
        tpx = jnp.where(regen, 1.0, tpx)
        tpy = jnp.where(regen, 1.0, tpy)
        tpz = jnp.where(regen, 1.0, tpz)
        alive = jnp.where(regen, 1.0, alive)
        bnc = jnp.where(regen, 0.0, bnc)

        # ---------------- one shared segment ------------------------------
        alive_b = (alive > 0.0) & not_stalled
        adv = advance(sph, sph_segs, rect, rect_segs, tri, tri_segs, med,
                      spec, ox, oy, oz, dx, dy, dz, tm, rng, alive_b,
                      n_med=n_med, t_min=t_min)

        # ---------------- termination policy ------------------------------
        bnc_n = jnp.where(alive_b, bnc + 1.0, bnc)
        exhausted = adv.did_scatter & (bnc_n >= f32(max_depth))
        absorb = adv.hit & jnp.logical_not(adv.did_scatter) \
            & jnp.logical_not(adv.stop_emit)
        ended = alive_b & (adv.miss | adv.stop_emit | absorb | exhausted)
        pf_empty = pf1 == 0.0
        pf_full = pf3 != 0.0
        black = absorb | exhausted      # contribution 0, drop pendings

        if attenuate:
            ew_x, ew_y, ew_z = tpx, tpy, tpz
            solid_emit_pend = jnp.logical_not(pf_empty)
        else:
            ew_x = ew_y = ew_z = one
            solid_emit_pend = jnp.zeros_like(pf_empty)

        emit_img = adv.stop_emit & adv.tk_image
        emit_solid = adv.stop_emit & jnp.logical_not(adv.tk_image)
        miss_pend = adv.miss & jnp.logical_not(pf_empty)
        # emissive image texel: in attenuate mode pendings stay relevant and
        # the emit index must append (rewind if full); in reference mode the
        # contribution is the raw texel (render.hpp:73) — pendings drop.
        if attenuate:
            emit_rewind = emit_img & pf_full
            emit_stall = emit_img & jnp.logical_not(pf_full)
        else:
            emit_rewind = jnp.zeros_like(emit_img)
            emit_stall = emit_img

        want_pend = ended & (miss_pend | (emit_solid & solid_emit_pend)
                             | emit_stall) & jnp.logical_not(black)
        # mid-path image albedo: append pending; overflow rewinds segment
        midalb = alive_b & adv.did_scatter & adv.tk_image \
            & jnp.logical_not(exhausted)
        stall2 = (alive_b & ((midalb & pf_full) | emit_rewind))
        want_pend = want_pend & jnp.logical_not(stall2)
        # single-texel pendings PARK (lane continues with the next sample;
        # driver resolves acc += term * texel after the call); multi-texel
        # or park-slots-full fall back to a stall
        one_pf = (pf1 != 0.0) & (pf2 == 0.0)
        not_ei = jnp.logical_not(emit_img)
        # boolean select as logic ops (Mosaic lacks i1 vector selects)
        if attenuate:
            single = (emit_img & (pf1 == 0.0)) | (not_ei & one_pf)
        else:
            single = emit_img | (not_ei & one_pf)
        parkable = want_pend & single & (pk4 == 0.0)
        stall1 = want_pend & jnp.logical_not(parkable)

        # inline contributions (no pendings involved)
        c_miss = adv.miss & pf_empty
        c_solid = emit_solid & jnp.logical_not(solid_emit_pend)
        contr_x = jnp.where(c_miss, tpx * adv.sky_x, 0.0) \
            + jnp.where(c_solid, ew_x * adv.alb_x, 0.0)
        contr_y = jnp.where(c_miss, tpy * adv.sky_y, 0.0) \
            + jnp.where(c_solid, ew_y * adv.alb_y, 0.0)
        contr_z = jnp.where(c_miss, tpz * adv.sky_z, 0.0) \
            + jnp.where(c_solid, ew_z * adv.alb_z, 0.0)
        add_c = ended & jnp.logical_not(stall1 | stall2)
        accx = accx + jnp.where(add_c, contr_x, 0.0)
        accy = accy + jnp.where(add_c, contr_y, 0.0)
        accz = accz + jnp.where(add_c, contr_z, 0.0)

        # stall-1 term: the factor multiplied by prod(texels) outside
        t1_x = jnp.where(adv.miss, tpx * adv.sky_x,
                         jnp.where(emit_img, ew_x, ew_x * adv.alb_x))
        t1_y = jnp.where(adv.miss, tpy * adv.sky_y,
                         jnp.where(emit_img, ew_y, ew_y * adv.alb_y))
        t1_z = jnp.where(adv.miss, tpz * adv.sky_z,
                         jnp.where(emit_img, ew_z, ew_z * adv.alb_z))
        trx = jnp.where(stall1, t1_x, trx)
        try_ = jnp.where(stall1, t1_y, try_)
        trz = jnp.where(stall1, t1_z, trz)

        # park append (slots fill in order 1..4; driver clears all at once)
        idxp1 = adv.atlas_idx + 1.0
        texsel = jnp.where(emit_img, idxp1, pf1)
        p1 = parkable & (pk1 == 0.0)
        p2 = parkable & (pk1 != 0.0) & (pk2 == 0.0)
        p3 = parkable & (pk1 != 0.0) & (pk2 != 0.0) & (pk3 == 0.0)
        p4 = parkable & (pk1 != 0.0) & (pk2 != 0.0) & (pk3 != 0.0)
        pk1 = jnp.where(p1, texsel, pk1)
        pk2 = jnp.where(p2, texsel, pk2)
        pk3 = jnp.where(p3, texsel, pk3)
        pk4 = jnp.where(p4, texsel, pk4)
        pkr1 = jnp.where(p1, t1_x, pkr1)
        pkr2 = jnp.where(p2, t1_x, pkr2)
        pkr3 = jnp.where(p3, t1_x, pkr3)
        pkr4 = jnp.where(p4, t1_x, pkr4)
        pkg1 = jnp.where(p1, t1_y, pkg1)
        pkg2 = jnp.where(p2, t1_y, pkg2)
        pkg3 = jnp.where(p3, t1_y, pkg3)
        pkg4 = jnp.where(p4, t1_y, pkg4)
        pkb1 = jnp.where(p1, t1_z, pkb1)
        pkb2 = jnp.where(p2, t1_z, pkb2)
        pkb3 = jnp.where(p3, t1_z, pkb3)
        pkb4 = jnp.where(p4, t1_z, pkb4)

        # pending list updates
        if attenuate:
            # append emit index on stall-1 of an emissive image texture
            app = (midalb & jnp.logical_not(pf_full)) \
                | (stall1 & emit_img)
        else:
            app = midalb & jnp.logical_not(pf_full)
        a1 = app & (pf1 == 0.0)
        a2 = app & (pf1 != 0.0) & (pf2 == 0.0)
        a3 = app & (pf1 != 0.0) & (pf2 != 0.0) & (pf3 == 0.0)
        pf1 = jnp.where(a1, idxp1, pf1)
        pf2 = jnp.where(a2, idxp1, pf2)
        pf3 = jnp.where(a3, idxp1, pf3)
        if not attenuate:
            # reference mode: emissive texel replaces pendings (they only
            # ever multiplied the discarded throughput, render.hpp:73)
            rep = stall1 & emit_img
            pf1 = jnp.where(rep, idxp1, pf1)
            pf2 = jnp.where(rep, 0.0, pf2)
            pf3 = jnp.where(rep, 0.0, pf3)
        # ended without stall: drop pendings
        drop = add_c
        pf1 = jnp.where(drop, 0.0, pf1)
        pf2 = jnp.where(drop, 0.0, pf2)
        pf3 = jnp.where(drop, 0.0, pf3)

        # ---------------- state advance / rewind --------------------------
        cont = alive_b & adv.did_scatter & jnp.logical_not(exhausted) \
            & jnp.logical_not(stall2)
        ox_n = jnp.where(cont, adv.px, ox)
        oy_n = jnp.where(cont, adv.py, oy)
        oz_n = jnp.where(cont, adv.pz, oz)
        dx_n = jnp.where(cont, adv.ndx, dx)
        dy_n = jnp.where(cont, adv.ndy, dy)
        dz_n = jnp.where(cont, adv.ndz, dz)
        tpx_n = jnp.where(cont, tpx * adv.att_x, tpx)
        tpy_n = jnp.where(cont, tpy * adv.att_y, tpy)
        tpz_n = jnp.where(cont, tpz * adv.att_z, tpz)
        # rewind: keep pre-segment rng (only draw-advanced lanes moved)
        rng_n = jnp.where(stall2, rng, adv.rng)
        bnc_out = jnp.where(stall2, bnc, bnc_n)
        s_adv = ended & jnp.logical_not(stall2)
        s_n = jnp.where(s_adv, s + 1.0, s)
        alive_n = jnp.where(stall2, 1.0,
                            jnp.where(cont, 1.0, 0.0))
        alive_n = jnp.where(jnp.logical_not(alive_b), alive, alive_n)
        stall_n = jnp.where(stall2, f32(ST_REWIND),
                            jnp.where(stall1, f32(ST_TERM), stall))
        wrk_n = wrk + jnp.where(alive_b & jnp.logical_not(stall2), 1.0, 0.0)

        return (ox_n, oy_n, oz_n, dx_n, dy_n, dz_n, tm, rng_n,
                tpx_n, tpy_n, tpz_n, accx, accy, accz, alive_n, s_n, pix,
                bnc_out, wrk_n, stall_n, pf1, pf2, pf3, trx, try_, trz,
                pk1, pk2, pk3, pk4, pkr1, pkr2, pkr3, pkr4,
                pkg1, pkg2, pkg3, pkg4, pkb1, pkb2, pkb3, pkb4,
                dpix, dr, dg, db)

    carry0 = st + (dpix0, zero, zero, zero)
    out = jax.lax.fori_loop(0, n_bounce, body, carry0)
    (ox, oy, oz, dx, dy, dz, tm, rng, tpx, tpy, tpz,
     accx, accy, accz, alive, s, pix, bnc, wrk, stall,
     pf1, pf2, pf3, trx, try_, trz,
     pk1, pk2, pk3, pk4, pkr1, pkr2, pkr3, pkr4,
     pkg1, pkg2, pkg3, pkg4, pkb1, pkb2, pkb3, pkb4,
     dpix, dr, dg, db) = out

    for ref, val in zip(
            (o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_tm, o_rng,
             o_tpx, o_tpy, o_tpz, o_accx, o_accy, o_accz,
             o_alive, o_s, o_pix, o_bnc, o_wrk, o_stall,
             o_pf1, o_pf2, o_pf3, o_trx, o_try, o_trz,
             o_pk1, o_pk2, o_pk3, o_pk4,
             o_pkr1, o_pkr2, o_pkr3, o_pkr4,
             o_pkg1, o_pkg2, o_pkg3, o_pkg4,
             o_pkb1, o_pkb2, o_pkb3, o_pkb4,
             o_dpix, o_dr, o_dg, o_db),
            (ox, oy, oz, dx, dy, dz, tm, rng, tpx, tpy, tpz,
             accx, accy, accz, alive, s, pix, bnc, wrk, stall,
             pf1, pf2, pf3, trx, try_, trz,
             pk1, pk2, pk3, pk4, pkr1, pkr2, pkr3, pkr4,
             pkg1, pkg2, pkg3, pkg4, pkb1, pkb2, pkb3, pkb4,
             dpix, dr, dg, db)):
        ref[:, :] = val

    # busy: running, stalled, mid-chunk (samples of the chunk remain), or
    # parked pendings (acc incomplete).  A lane that died mid-chunk on the
    # LAST segment of the call must keep the loop alive or its remaining
    # samples would never render.
    schunk_f = jnp.floor(s * (1.0 / f32(chunk)))
    mid = (s - schunk_f * f32(chunk)) != 0.0
    busy = (alive > 0.0) | (stall != 0.0) | mid | (pk1 != 0.0)
    q[3] = q[3] + jnp.sum(jnp.where(busy, 1.0, 0.0)).astype(jnp.int32)

    @pl.when(pid == nprog - 1)
    def _():
        qstate_out[0] = q[0]
        qstate_out[1] = q[1]
        qstate_out[2] = q[2]
        qstate_out[3] = q[3]


def wq_call(tables: SceneTables, st: WqState, qstate: jnp.ndarray, *,
            t_min: float, max_depth: int, attenuate: bool, n_bounce: int,
            chunk: int, cpp: int, tile_rows: int = DEF_TILE_ROWS,
            interpret: bool = False) -> WqOut:
    """Run B = n_bounce segments for every lane.  `qstate` is (4,) i32
    [pix0, cc0, rem, n_active]; chunk | spp and n_bounce <= chunk (the
    one-done-slot invariant)."""
    assert n_bounce <= chunk, (n_bounce, chunk)
    rows = st.ox.shape[0]
    assert rows % tile_rows == 0, (rows, tile_rows)
    grid = rows // tile_rows
    n_med = tables.med.shape[1]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    sh = (rows, LANE)
    out_shape = ([sds(sh, f32)] * 7 + [sds(sh, jnp.uint32)]
                 + [sds(sh, f32)] * (N_STATE - 8)  # tp acc alive s pix bnc
                                                   # wrk stall pf tr parks
                 + [sds(sh, f32)] * 4         # dpix dr dg db
                 + [sds((4,), jnp.int32)])    # qstate
    kern = functools.partial(
        _wq_kernel, n_med=n_med, t_min=float(t_min),
        max_depth=int(max_depth), attenuate=bool(attenuate),
        n_bounce=int(n_bounce), chunk=int(chunk), cpp=int(cpp))
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem] * 11 + [vspec] * N_STATE,
        out_specs=[vspec] * (N_STATE + 4) + [smem],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(tables.sph, tables.sph_segs, tables.rect, tables.rect_segs,
      tables.tri, tables.tri_segs, tables.med, tables.spec, tables.cam,
      tables.seed, qstate, *st)
    return WqOut(state=WqState(*outs[:N_STATE]),
                 dpix=outs[N_STATE], dr=outs[N_STATE + 1],
                 dg=outs[N_STATE + 2], db=outs[N_STATE + 3],
                 qstate=outs[N_STATE + 4])
