"""Shared in-kernel bounce pipeline for the pallas TPU megakernels.

`advance()` moves every live lane one path segment: intersect all primitive
classes in reference scan order, stochastic media, hit record, in-kernel
textures, material scatter, sky/emission terminal values — everything except
the *policy* around it (throughput/termination bookkeeping, sample
regeneration, queue refill, fixup deferral), which differs between
`wave_bounce` (pixel-pinned lanes, deferred per-call fixups) and
the work-queue drivers in engine.wq (global sample queue).

All math and draw accounting is the reference's, bit-for-bit where float
semantics allow:

* sphere fold in key = t*|d|^2 space with the running-best strict window
  (sphere.hpp:59-106), direct-oc quadratic for catastrophic-cancellation
  safety;
* rect fold in t space with the reject-form window (rectangle.hpp:16-130);
* Moller-Trumbore triangles with sign-trick early-out semantics
  (triangle.hpp:58-100);
* media two-probe boundary with per-medium closest-so-far prefix snapshots
  and RNG-draw gating (constant_medium.hpp:28-77);
* cross-class merge with the reference's scan-order tie rules
  (render.hpp:37-49; proof in engine/intersect._merge);
* the five materials' scatter with exact draw counts (material.hpp:11-131);
* solid/checker in-kernel textures; image textures resolve to an atlas
  index for the caller's fixup machinery (texture.hpp:18-151);
* sky gradient and the unattenuated-emission quirk inputs (render.hpp:58-91).

RNG: lockstep xorshift32 lanes (xorshift.hpp:72-74) with masked advancement
so draw counts per event match the reference exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import rng as rng_mod
from ...scene import types as T

LANE = 128

PI = float(rng_mod.PI)
INF = float("inf")
BIG = 3.0e38  # python floats: a captured jnp scalar would break pallas tracing

# meta packing: scan(10b) | texref(4b) | texkind(2b) | mtype(3b)  (19 bits,
# exact in f32).  texkind: 0 solid/plain (rgb carried), 1 checker, 2 image.
_M_SCAN = 1.0
_M_TEXREF = 1024.0
_M_TEXKIND = 1024.0 * 16.0
_M_MTYPE = 1024.0 * 16.0 * 4.0
MAX_SPECIAL_TEX = 16


# ---------------------------------------------------------------------------
# In-kernel math helpers (operate on (rows, 128) blocks)
# ---------------------------------------------------------------------------

def _xs32(s):
    """xorshift.hpp:72-74."""
    s = s ^ (s >> 7)
    s = s ^ (s << 1)
    s = s ^ (s >> 9)
    return s


def _u32_to_f01(u):
    """u32 -> [0,1] float like `generator() * 2^-32` (rtweekend.hpp:39-42).
    Mosaic lacks a u32->f32 value cast; split into exact 16-bit halves so
    the single rounding happens at the final add — bitwise identical to
    XLA's direct u32->f32 cast (core.rng.u32_to_f01).  The previous
    i32-plus-wrap-fix form double-rounded for some values >= 2^31, putting
    kernel camera rays 1 ulp off the XLA refill's and flipping knife-edge
    paths."""
    hi = (u >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    f = hi * jnp.float32(65536.0) + lo
    return f * jnp.float32(2.0 ** -32)


def _draw(state, mask):
    s2 = _xs32(state)
    state = jnp.where(mask, s2, state)
    return state, _u32_to_f01(s2)


def _draw_range(state, mask, lo, hi):
    state, f = _draw(state, mask)
    return state, lo + (hi - lo) * f


def _splitmix32(x):
    x = (x + jnp.uint32(0x9E3779B9))
    x = (x ^ (x >> 16)) * jnp.uint32(0x21F0AAAD)
    x = (x ^ (x >> 15)) * jnp.uint32(0x735A2D97)
    x = x ^ (x >> 15)
    return x


def _fast_atan(t):
    """atan on [-1, 1]; max err ~1e-7 (Estrin minimax, degree 17 odd)."""
    t2 = t * t
    p = jnp.float32(-9.2563e-4)
    p = p * t2 + jnp.float32(5.9624e-3)
    p = p * t2 + jnp.float32(-1.97338e-2)
    p = p * t2 + jnp.float32(4.30889e-2)
    p = p * t2 + jnp.float32(-7.5005e-2)
    p = p * t2 + jnp.float32(0.10571)
    p = p * t2 + jnp.float32(-0.14182)
    p = p * t2 + jnp.float32(0.19993)
    p = p * t2 + jnp.float32(-0.33332)
    p = p * t2 + jnp.float32(0.999999)
    return p * t


def _fast_atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi == 0.0, 1.0, hi)
    a = _fast_atan(t)
    a = jnp.where(ay > ax, jnp.float32(PI / 2) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(PI) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _fast_asin(y):
    return _fast_atan2(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


class Adv(NamedTuple):
    """Everything one segment produces, policy-free.  All (rows, 128)."""
    rng: jnp.ndarray            # state after this segment's draws
    hit: jnp.ndarray            # bool: live lane hit something
    miss: jnp.ndarray           # bool: live lane missed everything
    px: jnp.ndarray; py: jnp.ndarray; pz: jnp.ndarray   # hit point
    alb_x: jnp.ndarray; alb_y: jnp.ndarray; alb_z: jnp.ndarray
    tk_image: jnp.ndarray       # bool: winner's texture is an image
    atlas_idx: jnp.ndarray      # f32 atlas pixel index (valid iff tk_image)
    att_x: jnp.ndarray; att_y: jnp.ndarray; att_z: jnp.ndarray
    did_scatter: jnp.ndarray    # bool
    ndx: jnp.ndarray; ndy: jnp.ndarray; ndz: jnp.ndarray  # scattered dir
    stop_emit: jnp.ndarray      # bool: lightsource ended the path here
    sky_x: jnp.ndarray; sky_y: jnp.ndarray; sky_z: jnp.ndarray
    wscan: jnp.ndarray          # f32 winner scan id (valid iff hit)
    wcls: jnp.ndarray           # f32 winner class 0 sph/1 rect/2 tri/3 med
    t_hit: jnp.ndarray          # f32 winner key-space t (0 when no hit)


def advance(sph, sph_segs, rect, rect_segs, tri, tri_segs, med, spec,
            oxv, oyv, ozv, dxv, dyv, dzv, tmv, rngv, alive_b,
            *, n_med: int, t_min: float, sph_v=None,
            ablate: frozenset = frozenset()) -> Adv:
    """One path segment for every lane in the block.  Pure function of the
    values; scene tables are SMEM refs (or arrays in interpret mode) indexed
    scalar-wise inside fold loops.

    `sph_v` is a VMEM copy of the sphere table padded to a 128-column
    multiple: the hot fold carries only (best key, best index) — 10 fewer
    selects per sphere-lane pair than carrying the winner payload — and the
    winner's 14 attributes are reconstructed afterwards with per-block lane
    gathers (take_along_axis) from sph_v, whose cost is O(blocks), not
    O(spheres).  `ablate` disables stages for profiling only."""
    f32 = jnp.float32

    a = dxv * dxv + dyv * dyv + dzv * dzv
    a_safe = jnp.where(a == 0.0, 1.0, a)
    inv_a = 1.0 / a_safe
    tmin_a = f32(t_min) * a

    # =================== sphere fold (key = t*a space) ====================
    zero = jnp.zeros_like(a)
    bk = jnp.full_like(a, jnp.inf)
    bidx = zero

    def sph_static(i, c):
        bk, bidx = c
        # direct oc form (sphere.hpp:60-64): the factorized
        # o.o - 2(c.o) + |c|^2 - r^2 cancels catastrophically for far
        # spheres (|c|^2 ~ 3.6e3 in the reference scene).  co = c - o is
        # the exact negation of the reference's oc, so nb == -b bitwise
        # and every key below matches the payload-carrying fold exactly.
        cox = sph[0, i] - oxv
        coy = sph[1, i] - oyv
        coz = sph[2, i] - ozv
        nb = cox * dxv + coy * dyv + coz * dzv      # = -b
        cc = cox * cox + coy * coy + coz * coz - sph[8, i]
        disc = nb * nb - a * cc
        has = disc > 0.0           # strict: tangent (disc==0) misses
        # sqrt(neg) -> NaN; NaN comparisons are false, so no pre-clamp
        sq = jnp.sqrt(disc)
        k1 = nb - sq
        k2 = nb + sq
        # reference two-root selection in the running-best window
        # (sphere.hpp:76-92): first root if it passes, else second root
        cand = jnp.where(k1 > tmin_a, k1, k2)
        upd = has & (cand > tmin_a) & (cand < bk)
        return (jnp.where(upd, cand, bk),
                jnp.where(upd, i.astype(f32), bidx))

    def sph_moving(i, c):
        bk, bidx = c
        kmov = (tmv - sph[6, i]) * sph[7, i]
        # same associations as the static/payload form: c = c0 + kmov*dc
        # first, then co = c - o (exact negation of oc)
        cox = (sph[0, i] + kmov * sph[3, i]) - oxv
        coy = (sph[1, i] + kmov * sph[4, i]) - oyv
        coz = (sph[2, i] + kmov * sph[5, i]) - ozv
        nb = cox * dxv + coy * dyv + coz * dzv
        cc = cox * cox + coy * coy + coz * coz - sph[8, i]
        disc = nb * nb - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(disc)
        k1 = nb - sq
        k2 = nb + sq
        cand = jnp.where(k1 > tmin_a, k1, k2)
        upd = has & (cand > tmin_a) & (cand < bk)
        return (jnp.where(upd, cand, bk),
                jnp.where(upd, i.astype(f32), bidx))

    carry = (bk, bidx)
    sph_snap = []
    start = jnp.int32(0)
    for mseg in range(n_med + 1):
        static_end = sph_segs[mseg, 0]
        end = sph_segs[mseg, 1]
        carry = jax.lax.fori_loop(start, static_end, sph_static, carry)
        carry = jax.lax.fori_loop(static_end, end, sph_moving, carry)
        if mseg < n_med:
            sph_snap.append(carry[0])
        start = end
    bk, bidx = carry
    s_t = bk * inv_a   # inf stays inf

    # ---- winner attribute reconstruction (O(blocks) lane gathers) --------
    if sph_v is None:
        raise ValueError("advance() requires the VMEM sphere table sph_v")
    n_sph_pad = sph_v.shape[1]
    assert n_sph_pad % LANE == 0, n_sph_pad
    blkf = jnp.floor(bidx * f32(1.0 / LANE))
    loc = (bidx - blkf * f32(LANE)).astype(jnp.int32)
    # rows: 0-7 c0/dc/t0/invd, 9 rinv, 10 meta, 11 par, 12-14 rgb
    rows_needed = (0, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14)
    attr = {j: zero for j in rows_needed}
    for b in range(n_sph_pad // LANE):
        inb = blkf == f32(b)
        for j in rows_needed:
            rowv = jnp.broadcast_to(sph_v[j:j + 1, b * LANE:(b + 1) * LANE],
                                    loc.shape)
            g = jnp.take_along_axis(rowv, loc, axis=1)
            attr[j] = jnp.where(inb, g, attr[j])
    kmov_w = (tmv - attr[6]) * attr[7]       # 0 for static spheres
    bcx = attr[0] + kmov_w * attr[3]
    bcy = attr[1] + kmov_w * attr[4]
    bcz = attr[2] + kmov_w * attr[5]
    brinv = attr[9]; bmeta = attr[10]; bpar = attr[11]
    bar = attr[12]; bag = attr[13]; bab = attr[14]

    # =================== rect fold (t space, reject form) ==================
    inv_dx = 1.0 / dxv
    inv_dy = 1.0 / dyv
    inv_dz = 1.0 / dzv

    rt = jnp.full_like(a, jnp.inf)
    ru = zero; rv_ = zero; rmeta = zero; rpar = zero
    rar = zero; rag = zero; rab = zero; rxy = zero; rxz = zero

    def rect_body(i, c):
        (rt, ru, rv_, rmeta, rpar, rar, rag, rab, rxy, rxz) = c
        isxy = rect[0, i]; isxz = rect[1, i]; isyz = rect[2, i]
        kk = rect[3, i]
        a0 = rect[4, i]; a1 = rect[5, i]; b0 = rect[6, i]; b1 = rect[7, i]
        o_k = isyz * oxv + isxz * oyv + isxy * ozv
        d_k = isyz * dxv + isxz * dyv + isxy * dzv
        # true division, not reciprocal-multiply: bit-matches the jnp path
        # (rectangle.hpp:33 computes (k - o)/d); 0/0 -> nan rejects below
        t = (kk - o_k) / d_k
        ca = isxy + isxz   # a-axis is x for xy/xz, y for yz
        o_a = ca * oxv + isyz * oyv
        d_a = ca * dxv + isyz * dyv
        cb = isxz + isyz   # b-axis is y for xy, z for xz/yz
        o_b = isxy * oyv + cb * ozv
        d_b = isxy * dyv + cb * dzv
        av = o_a + t * d_a
        bv = o_b + t * d_b
        in_b = jnp.logical_not((av < a0) | (av > a1) | (bv < b0) | (bv > b1))
        finite = jnp.abs(t) < BIG
        ok = jnp.logical_not(t < f32(t_min)) & jnp.logical_not(t > rt) \
            & in_b & finite
        sel = lambda new, old: jnp.where(ok, new, old)
        return (sel(t, rt),
                sel((av - a0) * rect[8, i], ru),
                sel((bv - b0) * rect[9, i], rv_),
                sel(rect[10, i], rmeta), sel(rect[11, i], rpar),
                sel(rect[12, i], rar), sel(rect[13, i], rag),
                sel(rect[14, i], rab), sel(isxy, rxy), sel(isxz, rxz))

    carry_r = (rt, ru, rv_, rmeta, rpar, rar, rag, rab, rxy, rxz)
    rect_snap = []
    start = jnp.int32(0)
    for mseg in range(n_med + 1):
        end = rect_segs[mseg]
        if "rects" not in ablate:
            carry_r = jax.lax.fori_loop(start, end, rect_body, carry_r)
        if mseg < n_med:
            rect_snap.append(carry_r[0])
        start = end
    (rt, ru, rv_, rmeta, rpar, rar, rag, rab, rxy, rxz) = carry_r

    # =================== triangle fold (Moller-Trumbore) ===================
    tt = jnp.full_like(a, jnp.inf)
    tmeta = zero; tpar = zero; tnx = zero; tny = zero; tnz = zero
    tar = zero; tag = zero; tab_ = zero

    def tri_body(i, c):
        (tt, tmeta, tpar, tnx, tny, tnz, tar, tag, tab_) = c
        v0x = tri[0, i]; v0y = tri[1, i]; v0z = tri[2, i]
        e1x = tri[3, i]; e1y = tri[4, i]; e1z = tri[5, i]
        e2x = tri[6, i]; e2y = tri[7, i]; e2z = tri[8, i]
        hx = dyv * e2z - dzv * e2y
        hy = dzv * e2x - dxv * e2z
        hz = dxv * e2y - dyv * e2x
        aa = e1x * hx + e1y * hy + e1z * hz
        a_abs = jnp.abs(aa)
        a_pos = aa > 0.0
        sx = oxv - v0x; sy = oyv - v0y; sz = ozv - v0z
        u = sx * hx + sy * hy + sz * hz
        u_ok = jnp.logical_not((u > 0.0) ^ a_pos) & (jnp.abs(u) <= a_abs)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = dxv * qx + dyv * qy + dzv * qz
        v_ok = jnp.logical_not((v > 0.0) ^ a_pos) & (jnp.abs(u + v) <= a_abs)
        t = (e2x * qx + e2y * qy + e2z * qz) / aa
        valid = ((a_abs >= f32(1e-7)) & u_ok & v_ok
                 & jnp.logical_not(t < f32(t_min))
                 & jnp.logical_not(t > tt))
        sel = lambda new, old: jnp.where(valid, new, old)
        return (sel(t, tt), sel(tri[12, i], tmeta), sel(tri[13, i], tpar),
                sel(tri[9, i], tnx), sel(tri[10, i], tny),
                sel(tri[11, i], tnz), sel(tri[14, i], tar),
                sel(tri[15, i], tag), sel(tri[16, i], tab_))

    carry_t = (tt, tmeta, tpar, tnx, tny, tnz, tar, tag, tab_)
    tri_snap = []
    start = jnp.int32(0)
    for mseg in range(n_med + 1):
        end = tri_segs[mseg]
        if "tris" not in ablate:
            carry_t = jax.lax.fori_loop(start, end, tri_body, carry_t)
        if mseg < n_med:
            tri_snap.append(carry_t[0])
        start = end
    (tt, tmeta, tpar, tnx, tny, tnz, tar, tag, tab_) = carry_t

    # =================== cross-class merge =================================
    def unpack_scan(meta):
        return meta - jnp.floor(meta * f32(1.0 / _M_TEXREF)) * f32(_M_TEXREF)

    # sphere record (normal from center/radius; sphere.hpp:84,99)
    psx = oxv + s_t * dxv
    psy = oyv + s_t * dyv
    psz = ozv + s_t * dzv
    n_sx = (psx - bcx) * brinv
    n_sy = (psy - bcy) * brinv
    n_sz = (psz - bcz) * brinv

    w_t = s_t
    w_scan = unpack_scan(bmeta)
    w_meta = bmeta; w_par = bpar
    w_ar = bar; w_ag = bag; w_ab = bab
    w_nx = n_sx; w_ny = n_sy; w_nz = n_sz
    w_u = zero; w_v = zero
    w_tie = zero          # sphere: strict accept, loses later-equal ties
    w_cls = zero          # 0 sphere

    def merge(w, ct, cscan, cmeta, cpar, car, cag, cab, cnx, cny, cnz,
              cu, cv, ctie, ccls):
        (w_t, w_scan, w_meta, w_par, w_ar, w_ag, w_ab, w_nx, w_ny, w_nz,
         w_u, w_v, w_tie, w_cls) = w
        tie = ct == w_t
        b_later = cscan > w_scan
        # boolean select as logic ops (Mosaic lacks i1 vector selects)
        tie_rule = ((b_later & (ctie > 0.0))
                    | (jnp.logical_not(b_later) & (w_tie <= 0.0)))
        b_wins = (ct < w_t) | (tie & tie_rule)
        sel = lambda new, old: jnp.where(b_wins, new, old)
        return (sel(ct, w_t), sel(cscan, w_scan), sel(cmeta, w_meta),
                sel(cpar, w_par), sel(car, w_ar), sel(cag, w_ag),
                sel(cab, w_ab), sel(cnx, w_nx), sel(cny, w_ny),
                sel(cnz, w_nz), sel(cu, w_u), sel(cv, w_v),
                sel(ctie, w_tie), sel(ccls, w_cls))

    w = (w_t, w_scan, w_meta, w_par, w_ar, w_ag, w_ab, w_nx, w_ny, w_nz,
         w_u, w_v, w_tie, w_cls)
    one = zero + 1.0
    w = merge(w, rt, unpack_scan(rmeta), rmeta, rpar, rar, rag, rab,
              1.0 - rxy - rxz, rxz, rxy, ru, rv_, one, one)
    # triangle normal is cross(e1,e2) (carried in rows 9-11); u=v=0 (the
    # reference leaves triangle u,v stale; we define them 0 —
    # triangle.hpp:94-99).
    w = merge(w, tt, unpack_scan(tmeta), tmeta, tpar, tar, tag, tab_,
              tnx, tny, tnz, zero, zero, one, one + 1.0)

    # =================== media (constant_medium.hpp:28-77) ================
    rngv_cur = rngv
    earlier = jnp.full_like(a, jnp.inf)
    ray_len = jnp.sqrt(a)
    inv_len = ray_len * inv_a      # 1/|d|
    for m in range(n_med):
        act = med[12, m] > 0.0
        btype = med[0, m]
        # sphere boundary (both roots over (-inf, inf) then (t1+1e-4, inf))
        mcx = med[1, m]; mcy = med[2, m]; mcz = med[3, m]; mr = med[4, m]
        ocx = oxv - mcx; ocy = oyv - mcy; ocz = ozv - mcz
        b = ocx * dxv + ocy * dyv + ocz * dzv
        cc = ocx * ocx + ocy * ocy + ocz * ocz - mr * mr
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        st1 = (-b - sq) * inv_a
        st2 = (-b + sq) * inv_a
        hit2_s = has & (st2 > st1 + f32(1e-4))
        # box boundary: closest-hit over 6 sides, two probes (box.hpp:29-50)
        pmnx = med[5, m]; pmny = med[6, m]; pmnz = med[7, m]
        pmxx = med[8, m]; pmxy = med[9, m]; pmxz = med[10, m]
        ts = []
        for (kk_, o_kv, id_kv, o_av, d_av, a0_, a1_, o_bv, d_bv, b0_, b1_) in (
            (pmxz, ozv, inv_dz, oxv, dxv, pmnx, pmxx, oyv, dyv, pmny, pmxy),
            (pmnz, ozv, inv_dz, oxv, dxv, pmnx, pmxx, oyv, dyv, pmny, pmxy),
            (pmxy, oyv, inv_dy, oxv, dxv, pmnx, pmxx, ozv, dzv, pmnz, pmxz),
            (pmny, oyv, inv_dy, oxv, dxv, pmnx, pmxx, ozv, dzv, pmnz, pmxz),
            (pmxx, oxv, inv_dx, oyv, dyv, pmny, pmxy, ozv, dzv, pmnz, pmxz),
            (pmnx, oxv, inv_dx, oyv, dyv, pmny, pmxy, ozv, dzv, pmnz, pmxz),
        ):
            t = (kk_ - o_kv) * id_kv
            av = o_av + t * d_av
            bv = o_bv + t * d_bv
            okb = jnp.logical_not((av < a0_) | (av > a1_)
                                  | (bv < b0_) | (bv > b1_))
            okb = okb & (jnp.abs(t) < BIG)
            ts.append(jnp.where(okb, t, INF))
        entry = ts[0]
        for t_ in ts[1:]:
            entry = jnp.minimum(entry, t_)
        exit_t = jnp.full_like(a, jnp.inf)
        for t_ in ts:
            t2c_ = jnp.where(t_ < entry + f32(1e-4), INF, t_)
            exit_t = jnp.minimum(exit_t, t2c_)
        hit2_b = (entry < BIG) & (exit_t < BIG)

        is_box = btype == 1.0
        hit2 = ((is_box & hit2_b)
                | (jnp.logical_not(is_box) & hit2_s)) & act
        t_in = jnp.where(is_box, entry, st1)
        t_out = jnp.where(is_box, exit_t, st2)

        pre = jnp.minimum(sph_snap[m] * inv_a, rect_snap[m])
        pre = jnp.minimum(pre, tri_snap[m])
        pre = jnp.minimum(pre, earlier)

        t1c = jnp.maximum(t_in, f32(t_min))
        t1c = jnp.maximum(t1c, 0.0)
        t2c = jnp.minimum(t_out, pre)
        interval_ok = jnp.logical_not(t1c >= t2c)

        draw_mask = alive_b & hit2 & interval_ok
        rngv_cur, uni = _draw(rngv_cur, draw_mask)
        uni = jnp.where(draw_mask, uni, 0.5)
        dist_inside = (t2c - t1c) * ray_len
        hit_distance = med[11, m] * jnp.log(uni)
        accept = draw_mask & jnp.logical_not(hit_distance > dist_inside)
        t_e = t1c + hit_distance * inv_len
        mscan = unpack_scan(med[13, m]) + zero
        w = merge(w, jnp.where(accept, t_e, INF), mscan,
                  med[13, m] + zero, zero, med[14, m] + zero,
                  med[15, m] + zero, med[16, m] + zero,
                  one, zero, zero, zero, zero, one, one + 2.0)
        earlier = jnp.where(accept, jnp.minimum(earlier, t_e), earlier)

    (w_t, w_scan, w_meta, w_par, w_ar, w_ag, w_ab, w_nx, w_ny, w_nz,
     w_u, w_v, w_tie, w_cls) = w

    # =================== hit record (hitable.hpp:8-24) =====================
    hit = alive_b & (w_t < BIG)
    t_hit = jnp.where(hit, w_t, 0.0)
    px = oxv + t_hit * dxv
    py = oyv + t_hit * dyv
    pz = ozv + t_hit * dzv
    is_med_w = w_cls == 3.0
    d_dot_n = dxv * w_nx + dyv * w_ny + dzv * w_nz
    front = is_med_w | (d_dot_n < 0.0)
    nx_ = jnp.where(front, w_nx, -w_nx)
    ny_ = jnp.where(front, w_ny, -w_ny)
    nz_ = jnp.where(front, w_nz, -w_nz)
    # triangle/rect normals are unnormalized constants for tris; the
    # reference normalizes neither (triangle.hpp:97 uses raw cross).
    # sphere uv: mercator of the flipped normal (sphere.hpp:13-24)
    is_sph_w = w_cls == 0.0
    phi = _fast_atan2(nz_, jnp.where((nx_ == 0.0) & (nz_ == 0.0), 1.0, nx_))
    ycl = jnp.clip(ny_, -1.0, 1.0)
    theta = _fast_asin(ycl)
    u_merc = 1.0 - (phi + f32(PI)) * f32(1.0 / (2.0 * PI))
    v_merc = (theta + f32(PI / 2)) * f32(1.0 / PI)
    uu = jnp.where(is_sph_w, u_merc, w_u)
    vv = jnp.where(is_sph_w, v_merc, w_v)

    # unpack meta: mtype / texkind / texref
    mtype = jnp.floor(w_meta * f32(1.0 / _M_MTYPE))
    rem = w_meta - mtype * f32(_M_MTYPE)
    texkind = jnp.floor(rem * f32(1.0 / _M_TEXKIND))
    rem2 = rem - texkind * f32(_M_TEXKIND)
    texref = jnp.floor(rem2 * f32(1.0 / _M_TEXREF))

    # =================== texture resolve (texture.hpp) ====================
    alb_x, alb_y, alb_z = w_ar, w_ag, w_ab
    tk_checker = texkind == 1.0
    tk_image = texkind == 2.0
    c1x_ = zero; c1y_ = zero; c1z_ = zero
    c2x_ = zero; c2y_ = zero; c2z_ = zero
    twf = zero; thf = zero; toff = zero; tfreq = zero
    for j2 in range(0 if "tex" in ablate else MAX_SPECIAL_TEX):
        mj = texref == f32(j2)
        mjf = jnp.where(mj, 1.0, 0.0)
        c1x_ += mjf * spec[1, j2]; c1y_ += mjf * spec[2, j2]
        c1z_ += mjf * spec[3, j2]
        c2x_ += mjf * spec[4, j2]; c2y_ += mjf * spec[5, j2]
        c2z_ += mjf * spec[6, j2]
        twf += mjf * spec[7, j2]; thf += mjf * spec[8, j2]
        toff += mjf * spec[9, j2]; tfreq += mjf * spec[10, j2]
    sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
    odd = sines < 0.0
    alb_x = jnp.where(tk_checker, jnp.where(odd, c1x_, c2x_), alb_x)
    alb_y = jnp.where(tk_checker, jnp.where(odd, c1y_, c2y_), alb_y)
    alb_z = jnp.where(tk_checker, jnp.where(odd, c1z_, c2z_), alb_z)
    # image: atlas pixel index, fetched OUTSIDE (texture.hpp:139-150)
    fu = jnp.fmod(uu * tfreq, 1.0)
    fv = jnp.fmod(vv * tfreq, 1.0)
    wm1 = jnp.maximum(twf - 1.0, 0.0)
    hm1 = jnp.maximum(thf - 1.0, 0.0)
    ti = jnp.clip(jnp.floor(fu * wm1), 0.0, wm1)
    tj = jnp.clip(jnp.floor((1.0 - fv) * hm1), 0.0, hm1)
    atlas_idx = toff + tj * twf + ti
    alb_x = jnp.where(tk_image, 1.0, alb_x)
    alb_y = jnp.where(tk_image, 1.0, alb_y)
    alb_z = jnp.where(tk_image, 1.0, alb_z)

    # =================== scatter (material.hpp) ============================
    inv_len_d = jax.lax.rsqrt(a_safe)
    udx = dxv * inv_len_d
    udy = dyv * inv_len_d
    udz = dzv * inv_len_d

    is_lam = hit & (mtype == f32(T.MAT_LAMBERTIAN))
    is_metal = hit & (mtype == f32(T.MAT_METAL))
    is_diel = hit & (mtype == f32(T.MAT_DIELECTRIC))
    is_light = hit & (mtype == f32(T.MAT_LIGHT))
    is_iso = hit & (mtype == f32(T.MAT_ISOTROPIC))

    # lambertian: dir = n + unit_vec (3 draws, rtweekend.hpp:60-67)
    rngv_cur, xl = _draw_range(rngv_cur, is_lam, f32(-1.0), f32(1.0))
    maxy = jnp.sqrt(jnp.maximum(1.0 - xl * xl, 0.0))
    rngv_cur, fy = _draw(rngv_cur, is_lam)
    yl = -maxy + 2.0 * maxy * fy
    absz = jnp.sqrt(jnp.maximum(maxy * maxy - yl * yl, 0.0))
    rngv_cur, fz = _draw(rngv_cur, is_lam)
    zl = jnp.where(fz > 0.5, absz, -absz)
    dir_lam_x = nx_ + xl
    dir_lam_y = ny_ + yl
    dir_lam_z = nz_ + zl

    # metal: reflect(ud, n) + fuzz * ball (3 draws, rtweekend.hpp:70-80)
    rngv_cur, br_ = _draw(rngv_cur, is_metal)
    rngv_cur, bth = _draw_range(rngv_cur, is_metal, f32(0.0),
                                f32(2.0 * PI))
    rngv_cur, bph = _draw_range(rngv_cur, is_metal, f32(0.0), f32(PI))
    plan = br_ * jnp.sin(bph)
    ball_mx = plan * jnp.cos(bth)
    ball_my = plan * jnp.sin(bth)
    ball_mz = br_ * jnp.cos(bph)
    ud_dot_n = udx * nx_ + udy * ny_ + udz * nz_
    rfl_x = udx - 2.0 * ud_dot_n * nx_
    rfl_y = udy - 2.0 * ud_dot_n * ny_
    rfl_z = udz - 2.0 * ud_dot_n * nz_
    dm_x = rfl_x + w_par * ball_mx
    dm_y = rfl_y + w_par * ball_my
    dm_z = rfl_z + w_par * ball_mz
    metal_alive = (dm_x * nx_ + dm_y * ny_ + dm_z * nz_) > 0.0

    # dielectric (material.hpp:68-89)
    ior = jnp.where(is_diel, w_par, 1.5)
    ratio = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.minimum(-ud_dot_n, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = ratio * sin_t > 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    omc = 1.0 - cos_t
    omc2 = omc * omc
    reflectance = r0 + (1.0 - r0) * (omc2 * omc2 * omc)
    diel_draw = is_diel & jnp.logical_not(cannot)
    rngv_cur, unid = _draw(rngv_cur, diel_draw)
    choose_reflect = cannot | (diel_draw & (reflectance > unid))
    # refract (vec.hpp:29-35)
    rp_x = (udx + cos_t * nx_) * ratio
    rp_y = (udy + cos_t * ny_) * ratio
    rp_z = (udz + cos_t * nz_) * ratio
    rp_sq = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
    rpar_ = -jnp.sqrt(jnp.abs(1.0 - rp_sq))
    rr_x = rp_x + rpar_ * nx_
    rr_y = rp_y + rpar_ * ny_
    rr_z = rp_z + rpar_ * nz_
    dd_x = jnp.where(choose_reflect, rfl_x, rr_x)
    dd_y = jnp.where(choose_reflect, rfl_y, rr_y)
    dd_z = jnp.where(choose_reflect, rfl_z, rr_z)

    # isotropic: dir = ball (3 draws, material.hpp:122)
    rngv_cur, ir_ = _draw(rngv_cur, is_iso)
    rngv_cur, ith = _draw_range(rngv_cur, is_iso, f32(0.0), f32(2.0 * PI))
    rngv_cur, iph = _draw_range(rngv_cur, is_iso, f32(0.0), f32(PI))
    iplan = ir_ * jnp.sin(iph)
    di_x = iplan * jnp.cos(ith)
    di_y = iplan * jnp.sin(ith)
    di_z = ir_ * jnp.cos(iph)

    new_dx = jnp.where(is_lam, dir_lam_x,
                       jnp.where(is_metal, dm_x,
                                 jnp.where(is_diel, dd_x, di_x)))
    new_dy = jnp.where(is_lam, dir_lam_y,
                       jnp.where(is_metal, dm_y,
                                 jnp.where(is_diel, dd_y, di_y)))
    new_dz = jnp.where(is_lam, dir_lam_z,
                       jnp.where(is_metal, dm_z,
                                 jnp.where(is_diel, dd_z, di_z)))
    did_scatter = (hit & jnp.logical_not(is_light)
                   & (jnp.logical_not(is_metal) | metal_alive))
    # metal/dielectric attenuate by plain color (carried rgb)
    att_x = jnp.where(is_light, 1.0, alb_x)
    att_y = jnp.where(is_light, 1.0, alb_y)
    att_z = jnp.where(is_light, 1.0, alb_z)

    # =================== sky + emission inputs (render.hpp:58-91) ==========
    miss = alive_b & jnp.logical_not(hit)
    sky_tv = 0.5 * (udy + 1.0)
    sky_x = 1.0 - sky_tv + sky_tv * f32(0.5)
    sky_y = 1.0 - sky_tv + sky_tv * f32(0.7)
    sky_z = 1.0 - sky_tv + sky_tv * f32(1.0)
    stop_emit = is_light & jnp.logical_not(did_scatter)

    return Adv(rng=rngv_cur, hit=hit, miss=miss, px=px, py=py, pz=pz,
               alb_x=alb_x, alb_y=alb_y, alb_z=alb_z,
               tk_image=tk_image, atlas_idx=atlas_idx,
               att_x=att_x, att_y=att_y, att_z=att_z,
               did_scatter=did_scatter, ndx=new_dx, ndy=new_dy, ndz=new_dz,
               stop_emit=stop_emit, sky_x=sky_x, sky_y=sky_y, sky_z=sky_z,
               wscan=w_scan, wcls=w_cls, t_hit=t_hit)


def camera_ray_block(cam, pix, s_idx, seed0, mask, cur_rng):
    """Seed the (pixel, sample) stream and generate its camera ray for
    masked lanes (camera.hpp:93-100; jitter as render.hpp:96-97; stream
    seed = core.rng.seed_perf).  `cam` is the packed 23-scalar camera
    (wave_bounce.pack_camera), `pix`/`s_idx` f32 exact ints, `seed0` a u32
    scalar.  Masked-off lanes keep `cur_rng` and their ray values are
    garbage (callers select).  Returns (rng, ox, oy, oz, dx, dy, dz, time)."""
    f32 = jnp.float32
    pix_u = pix.astype(jnp.int32).astype(jnp.uint32)
    s_u = jnp.maximum(s_idx, 0.0).astype(jnp.int32).astype(jnp.uint32)
    # seed INSIDE the hash (a post-hash xor only perturbs low bits the
    # f32 draw conversion cannot see) — matches core.rng.seed_perf.
    st0 = _splitmix32(pix_u ^ _splitmix32(s_u ^ seed0))
    st0 = jnp.where(st0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), st0)
    rng_n = jnp.where(mask, st0, cur_rng)
    invW = 1.0 / cam[21]
    pyf = jnp.floor((pix + 0.5) * invW)
    pxf = pix - pyf * cam[21]
    rng_n, ju = _draw(rng_n, mask)
    rng_n, jv = _draw(rng_n, mask)
    # op-for-op the associations of integrator.camera_rays + Camera.get_ray
    # (true divides, rd scaled before the basis combine): drivers mix this
    # path with the XLA one per sample, so the two must be BIT-identical or
    # knife-edge paths diverge discretely (a cornell light hit flipped by a
    # 2-ulp direction difference).
    su = (pxf + ju) / cam[21]
    sv_ = (pyf + jv) / cam[22]
    rng_n, dkx = _draw_range(rng_n, mask, f32(-1.0), f32(1.0))
    dmaxy = jnp.sqrt(1.0 - dkx * dkx)
    rng_n, df = _draw(rng_n, mask)
    dky = -dmaxy + (dmaxy - (-dmaxy)) * df
    lrad = cam[18]
    rdx = dkx * lrad
    rdy = dky * lrad
    offx = cam[12] * rdx + cam[15] * rdy
    offy = cam[13] * rdx + cam[16] * rdy
    offz = cam[14] * rdx + cam[17] * rdy
    cox = cam[0] + offx
    coy = cam[1] + offy
    coz = cam[2] + offz
    cdx = cam[3] + cam[6] * su + cam[9] * sv_ - cam[0] - offx
    cdy = cam[4] + cam[7] * su + cam[10] * sv_ - cam[1] - offy
    cdz = cam[5] + cam[8] * su + cam[11] * sv_ - cam[2] - offz
    rng_n, ctime = _draw_range(rng_n, mask, cam[19], cam[20])
    return rng_n, cox, coy, coz, cdx, cdy, cdz, ctime
