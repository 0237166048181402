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

Layout.  Ray state is dense (rows, 128) f32/u32 — rays occupy both sublanes
and lanes, so every elementwise op runs at full VPU width (the (N,1)-column
layout of the class-matrix kernels wastes 127/128 lanes on per-ray math).
Scene tables are SMEM scalars folded over with a `fori_loop`; per-sphere
scalar loads overlap the ~30 VPU ops per 8x128 ray tile.

Exact reference-scan semantics (render.hpp:37-49).  Each class folds in scan
order with its own accept form — spheres use the strict window
`min < t < closest` (sphere.hpp:76,92: a later equal-t sphere never wins),
rects/triangles use the reject form (rectangle.hpp:35, triangle.hpp:90: a
later equal-t hit replaces) — and cross-class ties are resolved by the
(scan, tie-flag) merge rule proved equivalent in engine/intersect._merge.
The sphere fold runs in key = t*|d|^2 space (division-free; a > 0 makes the
order identical) with the *running-best* window, which reproduces the
reference's shrinking-window two-root selection exactly.

Media prefix minima (constant_medium.hpp:52-59): class tables are sorted by
scan and split at each medium's scan position, so closest-so-far *at the
medium's position* falls out as a loop-boundary snapshot — zero per-pair
cost (the (N,P)-matrix path pays 2 ops/pair/medium for the same value).

Material / texture denormalization: each primitive row carries its
material's type, param, and — when its texture is a plain solid — the
albedo rgb (metal/dielectric always: their albedo is a raw color,
material.hpp:37,73).  Checker textures evaluate in-kernel via a one-hot
sweep over the (tiny) special-texture table; image textures resolve to an
atlas pixel index fixed up OUTSIDE the kernel by `apply_fixups` (the only
XLA gather left per bounce).

RNG: the per-lane xorshift32 streams of core.rng, advanced with masked
uint32 ops; draw order and count per event match engine/{intersect,scatter}
exactly, so (pixel, sample) results are bit-comparable to the jnp perf path
modulo float-op reassociation.

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

from ...core import rng as rng_mod
from ...core.camera import Camera
from ...scene import types as T

LANE = 128
DEF_TILE_ROWS = 64          # rays per program = TILE_ROWS * 128

PI = float(rng_mod.PI)
INF = float("inf")
BIG = 3.0e38  # python floats: a captured jnp scalar would break pallas tracing

# fix_kind codes for the XLA-side atlas fixup
FIX_NONE = 0.0
FIX_ALBEDO = 1.0   # throughput *= atlas[fix_idx]
FIX_EMIT = 2.0     # acc += fix_w3 * atlas[fix_idx]

# meta packing: scan(10b) | texref(4b) | texkind(2b) | mtype(3b)  (19 bits,
# exact in f32).  texkind: 0 solid/plain (rgb carried), 1 checker, 2 image.
_M_SCAN = 1.0
_M_TEXREF = 1024.0
_M_TEXKIND = 1024.0 * 16.0
_M_MTYPE = 1024.0 * 16.0 * 4.0
MAX_SPECIAL_TEX = 16


class SceneTables(NamedTuple):
    """SMEM-resident packed scene (see pack_scene)."""
    sph: jnp.ndarray        # (13, Ps) f32
    sph_segs: jnp.ndarray   # (M+1, 2) i32: per media-segment (static_end, end)
    rect: jnp.ndarray       # (14, Pr) f32
    rect_segs: jnp.ndarray  # (M+1,) i32 segment ends
    tri: jnp.ndarray        # (17, Pt) f32
    tri_segs: jnp.ndarray   # (M+1,) i32
    med: jnp.ndarray        # (16, Mm) f32
    spec: jnp.ndarray       # (11, MAX_SPECIAL_TEX) f32 special textures
    cam: jnp.ndarray        # (23,) f32 camera + frame scalars
    consts: jnp.ndarray     # (8,) f32: t_min, max_depth, attenuate, W, H, ...
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
    spec = jnp.zeros((11, MAX_SPECIAL_TEX), jnp.float32)
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
    Mosaic lacks a u32->f32 value cast; go through i32 with a wrap fix."""
    i = u.astype(jnp.int32)
    f = i.astype(jnp.float32)
    f = jnp.where(i < 0, f + jnp.float32(4294967296.0), f)
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
                 # VMEM state in
                 ox, oy, oz, dx, dy, dz, tm, rng, tpx, tpy, tpz,
                 radx, rady, radz, accx, accy, accz, alive, s, bnc, wrk,
                 pix, send, strd,
                 # deferred image-texture fixup from the PREVIOUS bounce:
                 # fk_in/fw*_in are last call's fix outputs, texel is the
                 # XLA-gathered atlas pixel (packed u32 R|G<<8|B<<16)
                 fk_in, fwx_in, fwy_in, fwz_in, texel,
                 # outs
                 o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_tm, o_rng,
                 o_tpx, o_tpy, o_tpz, o_radx, o_rady, o_radz,
                 o_accx, o_accy, o_accz, o_alive, o_s, o_bnc, o_wrk,
                 o_fix_kind, o_fix_idx, o_fwx, o_fwy, o_fwz,
                 *, n_med: int, t_min: float, max_depth: int,
                 attenuate: bool):
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
    is_alb_fix = fkv == f32(FIX_ALBEDO)
    is_emit_fix = fkv == f32(FIX_EMIT)
    tpxv = jnp.where(is_alb_fix, tpxv * txr, tpxv)
    tpyv = jnp.where(is_alb_fix, tpyv * txg, tpyv)
    tpzv = jnp.where(is_alb_fix, tpzv * txb, tpzv)
    acc_x0 = accx[:, :] + jnp.where(is_emit_fix, fwx_in[:, :] * txr, 0.0)
    acc_y0 = accy[:, :] + jnp.where(is_emit_fix, fwy_in[:, :] * txg, 0.0)
    acc_z0 = accz[:, :] + jnp.where(is_emit_fix, fwz_in[:, :] * txb, 0.0)

    a = dxv * dxv + dyv * dyv + dzv * dzv
    a_safe = jnp.where(a == 0.0, 1.0, a)
    inv_a = 1.0 / a_safe
    o_o = oxv * oxv + oyv * oyv + ozv * ozv
    o_d = oxv * dxv + oyv * dyv + ozv * dzv
    tmin_a = f32(t_min) * a

    # =================== sphere fold (key = t*a space) ====================
    zero = jnp.zeros_like(a)
    bk = jnp.full_like(a, jnp.inf)
    bcx = zero; bcy = zero; bcz = zero
    brinv = zero; bmeta = zero; bpar = zero
    bar = zero; bag = zero; bab = zero

    def sph_static(i, c):
        (bk, bcx, bcy, bcz, brinv, bmeta, bpar, bar, bag, bab) = c
        cx = sph[0, i]; cy = sph[1, i]; cz = sph[2, i]
        r2 = sph[8, i]
        # direct oc form (sphere.hpp:60-64): the factorized
        # o.o - 2(c.o) + |c|^2 - r^2 cancels catastrophically for far
        # spheres (|c|^2 ~ 3.6e3 in the reference scene)
        ocx = oxv - cx; ocy = oyv - cy; ocz = ozv - cz
        b = ocx * dxv + ocy * dyv + ocz * dzv
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        negb = -b
        k1 = negb - sq
        k2 = negb + sq
        ok1 = has & (k1 > tmin_a) & (k1 < bk)
        ok2 = has & (k2 > tmin_a) & (k2 < bk)
        keyv = jnp.where(ok1, k1, jnp.where(ok2, k2, INF))
        upd = keyv < bk
        sel = lambda new, old: jnp.where(upd, new, old)
        return (sel(keyv, bk), sel(cx, bcx), sel(cy, bcy), sel(cz, bcz),
                sel(sph[9, i], brinv), sel(sph[10, i], bmeta),
                sel(sph[11, i], bpar), sel(sph[12, i], bar),
                sel(sph[13, i], bag), sel(sph[14, i], bab))

    def sph_moving(i, c):
        (bk, bcx, bcy, bcz, brinv, bmeta, bpar, bar, bag, bab) = c
        kmov = (tmv - sph[6, i]) * sph[7, i]
        cx = sph[0, i] + kmov * sph[3, i]
        cy = sph[1, i] + kmov * sph[4, i]
        cz = sph[2, i] + kmov * sph[5, i]
        r2 = sph[8, i]
        ocx = oxv - cx; ocy = oyv - cy; ocz = ozv - cz
        b = ocx * dxv + ocy * dyv + ocz * dzv
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        negb = -b
        k1 = negb - sq
        k2 = negb + sq
        ok1 = has & (k1 > tmin_a) & (k1 < bk)
        ok2 = has & (k2 > tmin_a) & (k2 < bk)
        keyv = jnp.where(ok1, k1, jnp.where(ok2, k2, INF))
        upd = keyv < bk
        sel = lambda new, old: jnp.where(upd, new, old)
        return (sel(keyv, bk), sel(cx, bcx), sel(cy, bcy), sel(cz, bcz),
                sel(sph[9, i], brinv), sel(sph[10, i], bmeta),
                sel(sph[11, i], bpar), sel(sph[12, i], bar),
                sel(sph[13, i], bag), sel(sph[14, i], bab))

    carry = (bk, bcx, bcy, bcz, brinv, bmeta, bpar, bar, bag, bab)
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
    (bk, bcx, bcy, bcz, brinv, bmeta, bpar, bar, bag, bab) = carry
    s_t = bk * inv_a   # inf stays inf

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
    any_special = True  # static shape; cost is a small one-hot sweep
    c1x_ = zero; c1y_ = zero; c1z_ = zero
    c2x_ = zero; c2y_ = zero; c2z_ = zero
    twf = zero; thf = zero; toff = zero; tfreq = zero
    for j2 in range(MAX_SPECIAL_TEX):
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

    # =================== termination + sky (render.hpp:58-91) ==============
    miss = alive_b & jnp.logical_not(hit)
    sky_tv = 0.5 * (udy + 1.0)
    sky_x = 1.0 - sky_tv + sky_tv * f32(0.5)
    sky_y = 1.0 - sky_tv + sky_tv * f32(0.7)
    sky_z = 1.0 - sky_tv + sky_tv * f32(1.0)
    rxv = rxv + jnp.where(miss, tpxv * sky_x, 0.0)
    ryv = ryv + jnp.where(miss, tpyv * sky_y, 0.0)
    rzv = rzv + jnp.where(miss, tpzv * sky_z, 0.0)

    # emission on scatter-fail: reference returns emitted UNattenuated
    # (render.hpp:73); attenuate=True gives the physical alternative.
    stop_emit = is_light & jnp.logical_not(did_scatter)
    if attenuate:
        ew_x, ew_y, ew_z = tpxv, tpyv, tpzv
    else:
        ew_x = ew_y = ew_z = jnp.ones_like(a)
    emit_inline = stop_emit & jnp.logical_not(tk_image)
    rxv = rxv + jnp.where(emit_inline, ew_x * alb_x, 0.0)
    ryv = ryv + jnp.where(emit_inline, ew_y * alb_y, 0.0)
    rzv = rzv + jnp.where(emit_inline, ew_z * alb_z, 0.0)

    cont = did_scatter
    tpx_n = jnp.where(cont, tpxv * att_x, tpxv)
    tpy_n = jnp.where(cont, tpyv * att_y, tpyv)
    tpz_n = jnp.where(cont, tpzv * att_z, tpzv)
    ox_n = jnp.where(cont, px, oxv)
    oy_n = jnp.where(cont, py, oyv)
    oz_n = jnp.where(cont, pz, ozv)
    dx_n = jnp.where(cont, new_dx, dxv)
    dy_n = jnp.where(cont, new_dy, dyv)
    dz_n = jnp.where(cont, new_dz, dzv)

    bnc_n = jnp.where(alive_b, bnc[:, :] + 1.0, bnc[:, :])
    exhausted = cont & (bnc_n >= f32(max_depth))
    alive_n = cont & jnp.logical_not(exhausted)
    finished = alive_b & jnp.logical_not(alive_n)

    acx_n = acc_x0 + jnp.where(finished, rxv, 0.0)
    acy_n = acc_y0 + jnp.where(finished, ryv, 0.0)
    acz_n = acc_z0 + jnp.where(finished, rzv, 0.0)

    # fixups for image-texture lanes, applied at the START of the next
    # call (or by wave.apply_emit_fix after the loop).  ALBEDO is gated on
    # alive_n: a depth-exhausted path returns black (render.hpp:91), so a
    # pending throughput multiply must not leak onto the regenerated lane.
    fk = jnp.where(alive_n & tk_image, f32(FIX_ALBEDO),
                   jnp.where(stop_emit & tk_image, f32(FIX_EMIT),
                             f32(FIX_NONE)))
    o_fix_kind[:, :] = fk
    o_fix_idx[:, :] = atlas_idx
    o_fwx[:, :] = ew_x
    o_fwy[:, :] = ew_y
    o_fwz[:, :] = ew_z

    # =================== regeneration (next sample of this pixel) ==========
    sv = s[:, :]
    s_next = sv + strd[:, :]
    regen = (finished | jnp.logical_not(alive_b)) & (s_next < send[:, :])
    s_n = jnp.where(regen, s_next, sv)
    # per-(pixel, sample) stream seed (core.rng.seed_perf)
    pix_u = pix[:, :].astype(jnp.int32).astype(jnp.uint32)
    s_u = jnp.maximum(s_n, 0.0).astype(jnp.int32).astype(jnp.uint32)
    # seed INSIDE the hash (a post-hash xor only perturbs low bits the
    # f32 draw conversion cannot see) — matches core.rng.seed_perf.
    st0 = _splitmix32(pix_u ^ _splitmix32(s_u ^ seed[0]))
    st0 = jnp.where(st0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), st0)
    rng_n = jnp.where(regen, st0, rngv_cur)
    # camera ray (camera.hpp:93-100; jitter as render.hpp:96-97)
    invW = 1.0 / cam[21]
    invH = 1.0 / cam[22]
    pixf = pix[:, :]
    pyf = jnp.floor((pixf + 0.5) * invW)
    pxf = pixf - pyf * cam[21]
    rng_n, ju = _draw(rng_n, regen)
    rng_n, jv = _draw(rng_n, regen)
    su = (pxf + ju) * invW
    sv_ = (pyf + jv) * invH
    rng_n, dkx = _draw_range(rng_n, regen, f32(-1.0), f32(1.0))
    dmaxy = jnp.sqrt(jnp.maximum(1.0 - dkx * dkx, 0.0))
    rng_n, df = _draw(rng_n, regen)
    dky = -dmaxy + 2.0 * dmaxy * df
    lrad = cam[18]
    offx = lrad * (dkx * cam[12] + dky * cam[15])
    offy = lrad * (dkx * cam[13] + dky * cam[16])
    offz = lrad * (dkx * cam[14] + dky * cam[17])
    cox = cam[0] + offx
    coy = cam[1] + offy
    coz = cam[2] + offz
    cdx = cam[3] + cam[6] * su + cam[9] * sv_ - cam[0] - offx
    cdy = cam[4] + cam[7] * su + cam[10] * sv_ - cam[1] - offy
    cdz = cam[5] + cam[8] * su + cam[11] * sv_ - cam[2] - offz
    rng_n, ctime = _draw_range(rng_n, regen, cam[19], cam[20])

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
    o_alive[:, :] = jnp.where(alive_n | regen, 1.0, 0.0)
    o_s[:, :] = s_n
    o_bnc[:, :] = jnp.where(regen, 0.0, bnc_n)
    o_wrk[:, :] = wrk[:, :] + alive[:, :]


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


def zero_fix(rows: int) -> Tuple[jnp.ndarray, ...]:
    """(fix_kind, fwx, fwy, fwz, texel) inputs for the first bounce."""
    z = jnp.zeros((rows, LANE), jnp.float32)
    return (z, z, z, z, jnp.zeros((rows, LANE), jnp.uint32))


def wave_bounce(tables: SceneTables, st: WaveState,
                fix=None, texel: jnp.ndarray = None, *, t_min: float,
                max_depth: int, attenuate: bool,
                tile_rows: int = DEF_TILE_ROWS,
                interpret: bool = False) -> WaveOut:
    """One bounce for every lane.  Lane count = rows*128 with rows a
    multiple of tile_rows.  `fix` is the previous call's WaveOut (or None
    for the first bounce) and `texel` the atlas texels for its fix_idx,
    packed u32 R|G<<8|B<<16 — the deferred image-texture fixup."""
    rows = st.ox.shape[0]
    assert rows % tile_rows == 0, (rows, tile_rows)
    grid = rows // tile_rows
    n_med = tables.med.shape[1]

    if fix is None:
        fk_in, fwx_in, fwy_in, fwz_in, texel = zero_fix(rows)
    else:
        fk_in, fwx_in, fwy_in, fwz_in = (fix.fix_kind, fix.fwx, fix.fwy,
                                         fix.fwz)
        assert texel is not None

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    state_sh = (rows, LANE)
    out_shape = ([sds(state_sh, f32)] * 7 + [sds(state_sh, jnp.uint32)]
                 + [sds(state_sh, f32)] * 13          # tp rad acc alive s bnc wrk
                 + [sds(state_sh, f32)] * 5)           # fix
    kern = functools.partial(
        _wave_kernel, n_med=n_med, t_min=float(t_min),
        max_depth=int(max_depth), attenuate=bool(attenuate))
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem] * 10 + [vspec] * 29,
        out_specs=[vspec] * 26,
        out_shape=out_shape,
        interpret=interpret,
    )(tables.sph, tables.sph_segs, tables.rect, tables.rect_segs,
      tables.tri, tables.tri_segs, tables.med, tables.spec, tables.cam,
      tables.seed,
      st.ox, st.oy, st.oz, st.dx, st.dy, st.dz, st.tm, st.rng,
      st.tpx, st.tpy, st.tpz, st.radx, st.rady, st.radz,
      st.accx, st.accy, st.accz, st.alive, st.s, st.bnc, st.wrk,
      st.pix, st.send, st.strd,
      fk_in, fwx_in, fwy_in, fwz_in, texel)
    new = WaveState(*outs[:21], pix=st.pix, send=st.send, strd=st.strd)
    return WaveOut(state=new, fix_kind=outs[21], fix_idx=outs[22],
                   fwx=outs[23], fwy=outs[24], fwz=outs[25])
