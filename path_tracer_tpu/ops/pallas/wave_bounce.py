"""Pallas TPU wavefront BOUNCE megakernel — one kernel advances every live
path by one bounce: intersect -> media -> hit record -> scatter -> sky/emit
termination -> path regeneration, entirely in VMEM.

Why one kernel.  The jnp bounce pipeline costs ~50 ms per 480K-lane bounce on
v5e, of which only ~6 ms is intersection arithmetic: the rest is HBM round
trips between dozens of XLA kernels plus TPU-hostile row gathers (material /
winner-attribute lookups).  This kernel keeps all per-lane state in registers
/ VMEM for the whole bounce and replaces every gather with either carried
fold registers or tiny one-hot sweeps, leaving only the image-texture atlas
fetch outside (see `FIX_*`).

The segment pipeline itself (intersection folds in reference scan order,
media, textures, scatter, sky — `bounce_core.advance`) lives in
bounce_core; this module adds the per-lane policy: sample regeneration
within a fixed (pixel, sample-range) assignment and the deferred per-call
image-texture fixup.

Layout.  Ray state is dense (rows, 128) f32/u32 — rays occupy both sublanes
and lanes, so every elementwise op runs at full VPU width.  Scene tables are
SMEM scalars folded over with `fori_loop`; per-sphere scalar loads overlap
the ~30 VPU ops per 8x128 ray tile.

Reference citations: sphere.hpp:59-106, rectangle.hpp:16-130,
triangle.hpp:58-100, constant_medium.hpp:28-77, material.hpp:11-131,
texture.hpp:18-151, camera.hpp:93-100, render.hpp:25-106.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.camera import Camera
from ...scene import types as T
from .bounce_core import (LANE, _M_MTYPE, _M_TEXKIND, _M_TEXREF,
                          MAX_SPECIAL_TEX, advance, camera_ray_block)

DEF_TILE_ROWS = 64          # rays per program = TILE_ROWS * 128

# fix_kind codes for the XLA-side atlas fixup
FIX_NONE = 0.0
FIX_ALBEDO = 1.0   # throughput *= atlas[fix_idx]
FIX_EMIT = 2.0     # acc += fix_w3 * atlas[fix_idx]


class SceneTables(NamedTuple):
    """SMEM-resident packed scene (see pack_scene)."""
    sph: jnp.ndarray        # (15, Ps) f32
    sph_segs: jnp.ndarray   # (M+1, 2) i32: per media-segment (static_end, end)
    rect: jnp.ndarray       # (15, Pr) f32
    rect_segs: jnp.ndarray  # (M+1,) i32 segment ends
    tri: jnp.ndarray        # (17, Pt) f32
    tri_segs: jnp.ndarray   # (M+1,) i32
    med: jnp.ndarray        # (17, Mm) f32
    spec: jnp.ndarray       # (11, MAX_SPECIAL_TEX) f32 special textures
    cam: jnp.ndarray        # (23,) f32 camera + frame scalars
    consts: jnp.ndarray     # (8,) f32 (reserved)
    seed: jnp.ndarray       # (1,) u32 base seed


def _meta(scan, texref, texkind, mtype):
    scan = jnp.clip(scan.astype(jnp.float32), 0, 1023)
    return (scan + texref.astype(jnp.float32) * _M_TEXREF
            + texkind.astype(jnp.float32) * _M_TEXKIND
            + mtype.astype(jnp.float32) * _M_MTYPE)


def _mat_info(scene: T.Scene, mat_idx: jnp.ndarray):
    """Denormalized material/texture info for a primitive array: returns
    (mtype, param, rgb, texref, texkind) with rgb = solid albedo or plain
    color (metal/dielectric), texref = index into the special-texture
    table for checker/image textures."""
    m = scene.materials
    tx = scene.textures
    take = lambda a: jnp.take(a, mat_idx)
    mtype = take(m.mtype).astype(jnp.int32)
    param = take(m.param).astype(jnp.float32)
    tex = take(m.tex).astype(jnp.int32)

    ttype = jnp.take(tx.ttype, tex).astype(jnp.int32)
    solid_rgb = (jnp.take(tx.c1.x, tex), jnp.take(tx.c1.y, tex),
                 jnp.take(tx.c1.z, tex))
    plain = (mtype == T.MAT_METAL) | (mtype == T.MAT_DIELECTRIC)
    mcol = (take(m.color.x), take(m.color.y), take(m.color.z))
    rgb = tuple(jnp.where(plain, pc, sc)
                for pc, sc in zip(mcol, solid_rgb))

    nonsolid = tx.ttype != T.TEX_SOLID
    rank = jnp.cumsum(nonsolid.astype(jnp.int32)) - 1
    texref = jnp.where(jnp.take(nonsolid, tex), jnp.take(rank, tex), 0)
    texref = jnp.clip(texref, 0, MAX_SPECIAL_TEX - 1)
    tk = jnp.where(ttype == T.TEX_CHECKER, 1, jnp.where(
        ttype == T.TEX_IMAGE, 2, 0))
    texkind = jnp.where(plain, 0, tk)
    return mtype, param, rgb, texref, texkind


def _sort_cols(order, *cols):
    return [jnp.take(c, order) for c in cols]


def _seg_key(scan, med_scans):
    """Media segment index of each primitive: number of media with smaller
    scan position."""
    return jnp.sum(scan[:, None] > med_scans[None, :], axis=1).astype(
        jnp.int32)


def pack_scene(scene: T.Scene) -> SceneTables:
    """Pack a Scene pytree into the kernel's SMEM tables.  Pure jnp (runs
    under jit; XLA hoists it out of the bounce loop)."""
    med_scans = jnp.where(scene.media.active, scene.media.scan,
                          jnp.int32(2 ** 30))
    n_med = scene.media.r.shape[0]

    # ---- spheres: sort by (segment, moving, scan); padding last ----------
    s = scene.spheres
    moving = ((s.time1 != s.time0) & s.active).astype(jnp.int32)
    seg = jnp.where(s.active, _seg_key(s.scan, med_scans), n_med)
    scan_c = jnp.where(s.active, s.scan, jnp.int32(2 ** 20))
    key = (seg * 4 + moving * 2) * (2 ** 21) + scan_c
    order = jnp.argsort(key)
    mtype, param, rgb, texref, texkind = _mat_info(scene, s.mat)
    (c0x, c0y, c0z, c1x, c1y, c1z, rad, t0, t1, act_f, scan_s, mt, pr,
     rr, rg, rb, txr, txk, seg_s, mov_s) = _sort_cols(
        order, s.c0.x, s.c0.y, s.c0.z, s.c1.x, s.c1.y, s.c1.z, s.radius,
        s.time0, s.time1, s.active.astype(jnp.float32), s.scan, mtype,
        param, *rgb, texref, texkind, seg, moving)
    dt = t1 - t0
    inv_dt = jnp.where(dt == 0.0, 0.0, 1.0 / jnp.where(dt == 0.0, 1.0, dt))
    dcx, dcy, dcz = c1x - c0x, c1y - c0y, c1z - c0z
    # padding/inactive spheres: r2 <= 0 and far away => disc < 0 always
    c0x = jnp.where(act_f > 0, c0x, 1.0e9)
    dcx = jnp.where(act_f > 0, dcx, 0.0)
    dcy = jnp.where(act_f > 0, dcy, 0.0)
    dcz = jnp.where(act_f > 0, dcz, 0.0)
    r2 = jnp.where(act_f > 0, rad * rad, 0.0)
    r_inv = jnp.where(rad == 0.0, 1.0, 1.0 / jnp.where(rad == 0.0, 1.0, rad))
    meta_s = _meta(scan_s, txr, txk, mt)
    sph = jnp.stack([c0x, c0y, c0z, dcx, dcy, dcz,
                     t0.astype(jnp.float32), inv_dt, r2, r_inv, meta_s,
                     pr, rr, rg, rb], axis=0)

    # per-(segment, moving) boundaries: counts of rows with key below
    seg_ends = []
    for mseg in range(n_med + 1):
        static_end = jnp.sum(((seg_s < mseg)
                              | ((seg_s == mseg) & (mov_s == 0))).astype(
            jnp.int32))
        end = jnp.sum((seg_s <= mseg).astype(jnp.int32))
        seg_ends.append(jnp.stack([static_end, end]))
    sph_segs = jnp.stack(seg_ends).astype(jnp.int32)

    # ---- rects ------------------------------------------------------------
    r = scene.rects
    seg_r = jnp.where(r.active, _seg_key(r.scan, med_scans), n_med)
    scan_cr = jnp.where(r.active, r.scan, jnp.int32(2 ** 20))
    # order by (segment, scan, sub) — sub preserves box side order
    key_r = (seg_r * (2 ** 24) + scan_cr * 8 + r.sub)
    order_r = jnp.argsort(key_r)
    mtype, param, rgb, texref, texkind = _mat_info(scene, r.mat)
    (axis_r, a0, a1, b0, b1, k_r, act_r, scan_r, mt_r, pr_r, rr_r, rg_r,
     rb_r, txr_r, txk_r, seg_rs) = _sort_cols(
        order_r, r.axis, r.a0, r.a1, r.b0, r.b1, r.k,
        r.active.astype(jnp.float32), r.scan, mtype, param, *rgb, texref,
        texkind, seg_r)
    # inactive: inverted bounds never pass
    a0 = jnp.where(act_r > 0, a0, 1.0)
    a1 = jnp.where(act_r > 0, a1, 0.0)
    da = a1 - a0
    db = b1 - b0
    inv_da = jnp.where(da == 0, 1.0, 1.0 / jnp.where(da == 0, 1.0, da))
    inv_db = jnp.where(db == 0, 1.0, 1.0 / jnp.where(db == 0, 1.0, db))
    is_xy = (axis_r == T.RECT_XY).astype(jnp.float32)
    is_xz = (axis_r == T.RECT_XZ).astype(jnp.float32)
    is_yz = (axis_r == T.RECT_YZ).astype(jnp.float32)
    meta_r = _meta(scan_r, txr_r, txk_r, mt_r)
    rect = jnp.stack([is_xy, is_xz, is_yz, k_r.astype(jnp.float32),
                      a0, a1, b0, b1, inv_da, inv_db, meta_r, pr_r,
                      rr_r, rg_r, rb_r], axis=0)
    rect_segs = jnp.stack([jnp.sum((seg_rs <= m).astype(jnp.int32))
                           for m in range(n_med + 1)]).astype(jnp.int32)

    # ---- triangles ---------------------------------------------------------
    tr = scene.triangles
    seg_t = jnp.where(tr.active, _seg_key(tr.scan, med_scans), n_med)
    scan_ct = jnp.where(tr.active, tr.scan, jnp.int32(2 ** 20))
    key_t = seg_t * (2 ** 24) + scan_ct
    order_t = jnp.argsort(key_t)
    mtype, param, rgb, texref, texkind = _mat_info(scene, tr.mat)
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z, act_t, scan_t, mt_t,
     pr_t, rr_t, rg_t, rb_t, txr_t, txk_t, seg_ts) = _sort_cols(
        order_t, tr.v0.x, tr.v0.y, tr.v0.z, tr.v1.x, tr.v1.y, tr.v1.z,
        tr.v2.x, tr.v2.y, tr.v2.z, tr.active.astype(jnp.float32), tr.scan,
        mtype, param, *rgb, texref, texkind, seg_t)
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    # inactive: zero edges => |a| < eps, never hits
    z = act_t > 0
    e1x = jnp.where(z, e1x, 0.0); e1y = jnp.where(z, e1y, 0.0)
    e1z = jnp.where(z, e1z, 0.0)
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    meta_t = _meta(scan_t, txr_t, txk_t, mt_t)
    tri = jnp.stack([v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                     nx, ny, nz, meta_t, pr_t, rr_t, rg_t, rb_t], axis=0)
    tri_segs = jnp.stack([jnp.sum((seg_ts <= m).astype(jnp.int32))
                          for m in range(n_med + 1)]).astype(jnp.int32)

    # ---- media (kept in scan order; builder packs them sorted) -----------
    md = scene.media
    mtype, param, rgb, texref, texkind = _mat_info(scene, md.mat)
    meta_m = _meta(jnp.where(md.active, md.scan, 1023), texref, texkind,
                   mtype)
    med = jnp.stack([
        md.btype.astype(jnp.float32), md.c.x, md.c.y, md.c.z, md.r,
        md.pmin.x, md.pmin.y, md.pmin.z, md.pmax.x, md.pmax.y, md.pmax.z,
        md.neg_inv_density, md.active.astype(jnp.float32), meta_m,
        rgb[0], rgb[1]], axis=0)
    med = jnp.concatenate([med, rgb[2][None, :]], axis=0)

    # ---- special textures (checker / image) -------------------------------
    tx = scene.textures
    nonsolid = tx.ttype != T.TEX_SOLID
    rank = jnp.cumsum(nonsolid.astype(jnp.int32)) - 1
    slot = jnp.where(nonsolid, rank, MAX_SPECIAL_TEX)
    cols = [tx.ttype.astype(jnp.float32), tx.c1.x, tx.c1.y, tx.c1.z,
            tx.c2.x, tx.c2.y, tx.c2.z, tx.width.astype(jnp.float32),
            tx.height.astype(jnp.float32), tx.offset.astype(jnp.float32),
            tx.freq]
    onehot = (slot[None, :] == jnp.arange(MAX_SPECIAL_TEX)[:, None])
    sel = onehot.astype(jnp.float32)  # (S, Ntex)
    spec = jnp.stack([sel @ c for c in cols], axis=0)  # (11, S)

    return SceneTables(
        sph=sph, sph_segs=sph_segs, rect=rect, rect_segs=rect_segs,
        tri=tri, tri_segs=tri_segs, med=med, spec=spec,
        cam=jnp.zeros((23,), jnp.float32),   # filled by pack_camera
        consts=jnp.zeros((8,), jnp.float32),
        seed=jnp.zeros((1,), jnp.uint32),
    )


def pack_camera(cam: Camera, width: int, height: int) -> jnp.ndarray:
    return jnp.stack([
        cam.origin.x, cam.origin.y, cam.origin.z,
        cam.lower_left_corner.x, cam.lower_left_corner.y,
        cam.lower_left_corner.z,
        cam.horizontal.x, cam.horizontal.y, cam.horizontal.z,
        cam.vertical.x, cam.vertical.y, cam.vertical.z,
        cam.u.x, cam.u.y, cam.u.z, cam.v.x, cam.v.y, cam.v.z,
        cam.lens_radius, cam.time0, cam.time1,
        jnp.float32(width), jnp.float32(height),
    ]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# The bounce kernel
# ---------------------------------------------------------------------------

# State array order (VMEM in; the first N_RW are also outputs in this order).
STATE_RW = ("ox", "oy", "oz", "dx", "dy", "dz", "tm", "rng",
            "tpx", "tpy", "tpz", "radx", "rady", "radz",
            "accx", "accy", "accz", "alive", "s", "bnc", "wrk")
STATE_RO = ("pix", "send", "strd")
FIX_OUT = ("fix_kind", "fix_idx", "fwx", "fwy", "fwz")


def _wave_kernel(# SMEM tables
                 sph, sph_segs, rect, rect_segs, tri, tri_segs, med, spec,
                 cam, seed,
                 # VMEM copy of the sphere table (winner reconstruction)
                 sph_v,
                 # VMEM state in
                 ox, oy, oz, dx, dy, dz, tm, rng, tpx, tpy, tpz,
                 radx, rady, radz, accx, accy, accz, alive, s, bnc, wrk,
                 pix, send, strd,
                 # deferred image-texture fixup from the PREVIOUS bounce:
                 # fk_in/fidx_in/fw*_in are last call's fix outputs, texel
                 # the XLA-gathered atlas pixel (packed u32 R|G<<8|B<<16),
                 # srv a 0/1 mask: the driver's texel service covered this
                 # lane's pending fixup this call.  Pending-but-unserved
                 # lanes STALL (state passes through, no draws, no
                 # advance) and re-expose their fixup until served —
                 # bounded texel service per bounce stays correct for
                 # arbitrarily texture-heavy scenes without any lax.cond.
                 fk_in, fidx_in, fwx_in, fwy_in, fwz_in, texel, srv,
                 # outs
                 o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_tm, o_rng,
                 o_tpx, o_tpy, o_tpz, o_radx, o_rady, o_radz,
                 o_accx, o_accy, o_accz, o_alive, o_s, o_bnc, o_wrk,
                 o_fix_kind, o_fix_idx, o_fwx, o_fwy, o_fwz,
                 o_win, o_thit,
                 *, n_med: int, t_min: float, max_depth: int,
                 attenuate: bool, ablate: frozenset = frozenset()):
    f32 = jnp.float32
    oxv, oyv, ozv = ox[:, :], oy[:, :], oz[:, :]
    dxv, dyv, dzv = dx[:, :], dy[:, :], dz[:, :]
    tmv = tm[:, :]
    rngv = rng[:, :]
    tpxv, tpyv, tpzv = tpx[:, :], tpy[:, :], tpz[:, :]
    rxv, ryv, rzv = radx[:, :], rady[:, :], radz[:, :]
    alive_b = alive[:, :] > 0.0

    # ---- apply the deferred fixup (texture.hpp:144-150 scale 1/255) ------
    tex_u = texel[:, :]
    scale = f32(1.0 / 255.0)
    txr = (tex_u & jnp.uint32(0xFF)).astype(jnp.int32).astype(f32) * scale
    txg = ((tex_u >> 8) & jnp.uint32(0xFF)).astype(jnp.int32).astype(f32) \
        * scale
    txb = ((tex_u >> 16) & jnp.uint32(0xFF)).astype(jnp.int32).astype(f32) \
        * scale
    fkv = fk_in[:, :]
    pend = fkv != f32(FIX_NONE)
    srvb = pend & (srv[:, :] > 0.0)
    stall = pend & jnp.logical_not(srvb)
    is_alb_fix = srvb & (fkv == f32(FIX_ALBEDO))
    is_emit_fix = srvb & (fkv == f32(FIX_EMIT))
    tpxv = jnp.where(is_alb_fix, tpxv * txr, tpxv)
    tpyv = jnp.where(is_alb_fix, tpyv * txg, tpyv)
    tpzv = jnp.where(is_alb_fix, tpzv * txb, tpzv)
    acc_x0 = accx[:, :] + jnp.where(is_emit_fix, fwx_in[:, :] * txr, 0.0)
    acc_y0 = accy[:, :] + jnp.where(is_emit_fix, fwy_in[:, :] * txg, 0.0)
    acc_z0 = accz[:, :] + jnp.where(is_emit_fix, fwz_in[:, :] * txb, 0.0)

    # ---- one shared path segment (stalled lanes do not advance) ----------
    alive_adv = alive_b & jnp.logical_not(stall)
    adv = advance(sph, sph_segs, rect, rect_segs, tri, tri_segs, med, spec,
                  oxv, oyv, ozv, dxv, dyv, dzv, tmv, rngv, alive_adv,
                  n_med=n_med, t_min=t_min, sph_v=sph_v, ablate=ablate)
    rngv_cur = adv.rng

    # =================== termination + sky (render.hpp:58-91) ==============
    miss = adv.miss
    rxv = rxv + jnp.where(miss, tpxv * adv.sky_x, 0.0)
    ryv = ryv + jnp.where(miss, tpyv * adv.sky_y, 0.0)
    rzv = rzv + jnp.where(miss, tpzv * adv.sky_z, 0.0)

    # emission on scatter-fail: reference returns emitted UNattenuated
    # (render.hpp:73); attenuate=True gives the physical alternative.
    stop_emit = adv.stop_emit
    if attenuate:
        ew_x, ew_y, ew_z = tpxv, tpyv, tpzv
    else:
        one_ = jnp.ones_like(tpxv)
        ew_x = ew_y = ew_z = one_
    emit_inline = stop_emit & jnp.logical_not(adv.tk_image)
    rxv = rxv + jnp.where(emit_inline, ew_x * adv.alb_x, 0.0)
    ryv = ryv + jnp.where(emit_inline, ew_y * adv.alb_y, 0.0)
    rzv = rzv + jnp.where(emit_inline, ew_z * adv.alb_z, 0.0)

    cont = adv.did_scatter
    tpx_n = jnp.where(cont, tpxv * adv.att_x, tpxv)
    tpy_n = jnp.where(cont, tpyv * adv.att_y, tpyv)
    tpz_n = jnp.where(cont, tpzv * adv.att_z, tpzv)
    ox_n = jnp.where(cont, adv.px, oxv)
    oy_n = jnp.where(cont, adv.py, oyv)
    oz_n = jnp.where(cont, adv.pz, ozv)
    dx_n = jnp.where(cont, adv.ndx, dxv)
    dy_n = jnp.where(cont, adv.ndy, dyv)
    dz_n = jnp.where(cont, adv.ndz, dzv)

    bnc_n = jnp.where(alive_adv, bnc[:, :] + 1.0, bnc[:, :])
    exhausted = cont & (bnc_n >= f32(max_depth))
    alive_n = cont & jnp.logical_not(exhausted)
    finished = alive_adv & jnp.logical_not(alive_n)

    acx_n = acc_x0 + jnp.where(finished, rxv, 0.0)
    acy_n = acc_y0 + jnp.where(finished, ryv, 0.0)
    acz_n = acc_z0 + jnp.where(finished, rzv, 0.0)

    # fixups for image-texture lanes, applied at the START of the next
    # call (or by wave.apply_emit_fix after the loop).  ALBEDO is gated on
    # alive_n: a depth-exhausted path returns black (render.hpp:91), so a
    # pending throughput multiply must not leak onto the regenerated lane.
    fk = jnp.where(alive_n & adv.tk_image, f32(FIX_ALBEDO),
                   jnp.where(stop_emit & adv.tk_image, f32(FIX_EMIT),
                             f32(FIX_NONE)))
    o_fix_kind[:, :] = jnp.where(stall, fkv, fk)
    o_fix_idx[:, :] = jnp.where(stall, fidx_in[:, :], adv.atlas_idx)
    o_fwx[:, :] = jnp.where(stall, fwx_in[:, :], ew_x)
    o_fwy[:, :] = jnp.where(stall, fwy_in[:, :], ew_y)
    o_fwz[:, :] = jnp.where(stall, fwz_in[:, :], ew_z)

    # winner record for the VJP's record-and-replay residuals (diff.
    # pallas_vjp / diff.queued_vjp): win = ((term*4 + cls)*1024 + scan) + 1,
    # exact in f32; 0 = the lane did NOT advance (dead or stalled).  The +1
    # keeps "continue, sphere class, scan id 0" (a real segment on the
    # reference scene's ground sphere) distinguishable from a dead lane.
    # term: 0 continue, 1 sky miss, 2 emission stop, 3 absorb
    # (scatter-fail on a non-light), 4 depth-exhausted.
    term = jnp.where(miss, f32(1.0),
                     jnp.where(stop_emit, f32(2.0),
                               jnp.where(adv.hit & jnp.logical_not(
                                   adv.did_scatter | stop_emit), f32(3.0),
                                         jnp.where(exhausted, f32(4.0),
                                                   f32(0.0)))))
    o_win[:, :] = jnp.where(
        alive_adv, (term * 4.0 + adv.wcls) * 1024.0 + adv.wscan + 1.0, 0.0)
    o_thit[:, :] = adv.t_hit

    # =================== regeneration (next sample of this pixel) ==========
    sv = s[:, :]
    s_next = sv + strd[:, :]
    regen = ((finished | jnp.logical_not(alive_b))
             & (s_next < send[:, :]) & jnp.logical_not(stall))
    s_n = jnp.where(regen, s_next, sv)
    pixf = pix[:, :]
    (rng_n, cox, coy, coz, cdx, cdy, cdz, ctime) = camera_ray_block(
        cam, pixf, s_n, seed[0], regen, rngv_cur)

    o_ox[:, :] = jnp.where(regen, cox, ox_n)
    o_oy[:, :] = jnp.where(regen, coy, oy_n)
    o_oz[:, :] = jnp.where(regen, coz, oz_n)
    o_dx[:, :] = jnp.where(regen, cdx, dx_n)
    o_dy[:, :] = jnp.where(regen, cdy, dy_n)
    o_dz[:, :] = jnp.where(regen, cdz, dz_n)
    o_tm[:, :] = jnp.where(regen, ctime, tmv)
    o_rng[:, :] = rng_n
    o_tpx[:, :] = jnp.where(regen, 1.0, tpx_n)
    o_tpy[:, :] = jnp.where(regen, 1.0, tpy_n)
    o_tpz[:, :] = jnp.where(regen, 1.0, tpz_n)
    o_radx[:, :] = jnp.where(regen | finished, 0.0, rxv)
    o_rady[:, :] = jnp.where(regen | finished, 0.0, ryv)
    o_radz[:, :] = jnp.where(regen | finished, 0.0, rzv)
    o_accx[:, :] = acx_n
    o_accy[:, :] = acy_n
    o_accz[:, :] = acz_n
    o_alive[:, :] = jnp.where(alive_n | regen | (stall & alive_b),
                              1.0, 0.0)
    o_s[:, :] = s_n
    o_bnc[:, :] = jnp.where(regen, 0.0, bnc_n)
    o_wrk[:, :] = wrk[:, :] + jnp.where(alive_adv, 1.0, 0.0)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

class WaveState(NamedTuple):
    """Per-lane path state, all (rows, 128).  f32 except rng (u32).  Masks
    are f32 0/1; pix/s/send/strd are exact small integers in f32."""
    ox: jnp.ndarray; oy: jnp.ndarray; oz: jnp.ndarray
    dx: jnp.ndarray; dy: jnp.ndarray; dz: jnp.ndarray
    tm: jnp.ndarray
    rng: jnp.ndarray
    tpx: jnp.ndarray; tpy: jnp.ndarray; tpz: jnp.ndarray
    radx: jnp.ndarray; rady: jnp.ndarray; radz: jnp.ndarray
    accx: jnp.ndarray; accy: jnp.ndarray; accz: jnp.ndarray
    alive: jnp.ndarray
    s: jnp.ndarray
    bnc: jnp.ndarray
    wrk: jnp.ndarray
    pix: jnp.ndarray
    send: jnp.ndarray
    strd: jnp.ndarray


class WaveOut(NamedTuple):
    state: WaveState            # pix/send/strd passed through unchanged
    fix_kind: jnp.ndarray
    fix_idx: jnp.ndarray
    fwx: jnp.ndarray
    fwy: jnp.ndarray
    fwz: jnp.ndarray
    win: jnp.ndarray            # ((term*4 + cls)*1024 + scan), 0 for dead
    t_hit: jnp.ndarray          # winner t (diff.pallas_vjp residual)


class FixState(NamedTuple):
    """Pending image-texture fixups, (rows, 128) f32: last call's fix
    outputs, carried by the driver until its texel service covers them."""
    kind: jnp.ndarray      # FIX_NONE / FIX_ALBEDO / FIX_EMIT
    idx: jnp.ndarray       # atlas pixel index (exact int in f32)
    fwx: jnp.ndarray; fwy: jnp.ndarray; fwz: jnp.ndarray


def zero_fix(rows: int) -> FixState:
    """Empty pending-fix state (first bounce)."""
    z = jnp.zeros((rows, LANE), jnp.float32)
    return FixState(kind=z, idx=z, fwx=z, fwy=z, fwz=z)


def wave_bounce(tables: SceneTables, st: WaveState,
                fix: FixState = None, texel: jnp.ndarray = None,
                srv: jnp.ndarray = None, *, t_min: float,
                max_depth: int, attenuate: bool,
                tile_rows: int = DEF_TILE_ROWS,
                interpret: bool = False,
                ablate: frozenset = frozenset()) -> WaveOut:
    """One bounce for every lane.  Lane count = rows*128 with rows a
    multiple of tile_rows.  `fix` is the previous call's pending-fixup
    state (None for the first bounce), `texel` the atlas texels the
    driver's texel service resolved for it (packed u32 R|G<<8|B<<16), and
    `srv` a 0/1 mask of which pending fixups that service covered — lanes
    with an uncovered pending fixup stall this call (see _wave_kernel)."""
    rows = st.ox.shape[0]
    assert rows % tile_rows == 0, (rows, tile_rows)
    grid = rows // tile_rows
    n_med = tables.med.shape[1]

    if fix is None:
        fix = zero_fix(rows)
        texel = jnp.zeros((rows, LANE), jnp.uint32)
        srv = None
    if srv is None:
        srv = jnp.ones((rows, LANE), jnp.float32)
    fk_in, fidx_in, fwx_in, fwy_in, fwz_in = fix

    # VMEM copy of the sphere table, padded to a lane multiple, for the
    # post-fold winner-attribute lane gathers (bounce_core.advance)
    p_sph = tables.sph.shape[1]
    p_pad = -(-p_sph // LANE) * LANE
    sph_v = jnp.pad(tables.sph, ((0, 0), (0, p_pad - p_sph)))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    state_sh = (rows, LANE)
    out_shape = ([sds(state_sh, f32)] * 7 + [sds(state_sh, jnp.uint32)]
                 + [sds(state_sh, f32)] * 13          # tp rad acc alive s bnc wrk
                 + [sds(state_sh, f32)] * 7)           # fix + win + t_hit
    kern = functools.partial(
        _wave_kernel, n_med=n_med, t_min=float(t_min),
        max_depth=int(max_depth), attenuate=bool(attenuate),
        ablate=ablate)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem] * 10 + [vfull] + [vspec] * 31,
        out_specs=[vspec] * 28,
        out_shape=out_shape,
        interpret=interpret,
    )(tables.sph, tables.sph_segs, tables.rect, tables.rect_segs,
      tables.tri, tables.tri_segs, tables.med, tables.spec, tables.cam,
      tables.seed, sph_v,
      st.ox, st.oy, st.oz, st.dx, st.dy, st.dz, st.tm, st.rng,
      st.tpx, st.tpy, st.tpz, st.radx, st.rady, st.radz,
      st.accx, st.accy, st.accz, st.alive, st.s, st.bnc, st.wrk,
      st.pix, st.send, st.strd,
      fk_in, fidx_in, fwx_in, fwy_in, fwz_in, texel, srv)
    new = WaveState(*outs[:21], pix=st.pix, send=st.send, strd=st.strd)
    return WaveOut(state=new, fix_kind=outs[21], fix_idx=outs[22],
                   fwx=outs[23], fwy=outs[24], fwz=outs[25],
                   win=outs[26], t_hit=outs[27])
