"""Megakernel-speed gradients: record-and-replay custom VJP.

The jnp differentiable path (`integrator.trace(differentiable=True)`)
autodiffs through the FULL per-bounce fold over every primitive — correct
but ~100x off the megakernel's forward speed.  This module instead:

* **Forward**: the pallas `wave_bounce` kernel traces pixel-pinned lanes
  (one sample per lane) for `max_depth` bounces, recording per-bounce
  compact residuals: the incoming direction, the winner id
  (termination*4096 + class*1024 + scan), the winner t, and the resolved
  image-texture texel.  Cost = the production forward kernel + 6 stacked
  (depth, lanes) f32 writes.
* **Backward**: a winner-only jnp replay reconstructs every
  differentiable quantity of the path from the residuals, gathering ONLY
  the winning primitive's parameters per bounce — no full-scene fold —
  and plain jax reverse-mode runs through it.  Every discrete decision
  (winner identity, dielectric branch, medium acceptance, RNG-derived
  unit vectors) is pinned to the recorded path, the standard
  detached-sampling estimator — exactly the estimator of the jnp path
  (diff.params docstring), so the two agree up to float reassociation.

No RNG replay is needed: all draw-derived values reconstruct from the
recorded directions (lambertian unit vector = d_next - n; metal fuzz ball
= (d_next - reflect)/fuzz; medium log-u from the recorded event t), and
the bounce-0 camera ray re-derives differentiably from
`integrator.camera_rays` with the recorded stream seed.

Scope notes (documented estimator cuts, same class as the jnp path's):
medium event positions couple to OTHER geometry only through the
(detached) interval clip; image-texture texels are detached (the atlas is
uint8 data); silhouette/edge terms are not estimated (interior terms
only), matching BASELINE's smooth-config gradient target.

Reference semantics being differentiated: render.hpp:25-106,
material.hpp:11-131, sphere.hpp:59-106, rectangle.hpp:16-130,
triangle.hpp:58-100, constant_medium.hpp:28-77, camera.hpp:93-100.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..engine import wq as WQ
from ..engine.integrator import camera_rays
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB

LANE = WB.LANE
SG = jax.lax.stop_gradient


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Forward recording driver (pallas)
# ---------------------------------------------------------------------------

class Residuals(NamedTuple):
    """Per-bounce records, all (depth, rows, 128) f32 except texel (u32)."""
    dx: jnp.ndarray; dy: jnp.ndarray; dz: jnp.ndarray
    win: jnp.ndarray          # ((term*4+cls)*1024 + scan) + 1; 0 = dead
    t: jnp.ndarray            # winner t
    texel: jnp.ndarray        # packed R|G<<8|B<<16 (valid iff fix fired)


def record_forward(scene: T.Scene, cam: Camera, width: int, height: int,
                   pix: jnp.ndarray, samp: jnp.ndarray, *,
                   max_depth: int, attenuate: bool, t_min: float,
                   seed, tile_rows: int, interpret: bool
                   ) -> Tuple[jnp.ndarray, Residuals]:
    """Trace one sample per lane with the megakernel, recording residuals.
    Returns (radiance (L, 3), residuals).  `pix`/`samp` are (L,) ids; L
    pads up to tile_rows*128 lanes."""
    L = pix.shape[0]
    lanes = _round_up(L, tile_rows * LANE)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32

    tables = WB.pack_scene(scene)
    tables = tables._replace(
        cam=WB.pack_camera(cam, width, height),
        seed=jnp.asarray(seed).reshape(1).astype(jnp.uint32))
    atlas_flat, n_atlas = WQ._pack_atlas_flat(scene.textures.atlas)
    inv255 = f32(1.0 / 255.0)

    padp = jnp.zeros((lanes - L,), pix.dtype)
    pix_f = jnp.concatenate([pix, padp]).astype(jnp.uint32)
    samp_f = jnp.concatenate([samp, jnp.zeros((lanes - L,), samp.dtype)
                              ]).astype(jnp.uint32)
    live0 = (jnp.arange(lanes) < L)

    rng0 = rng_mod.splitmix32(pix_f ^ rng_mod.splitmix32(
        samp_f ^ tables.seed[0]))
    rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
    rng1, o, d, tmv = camera_rays(cam, width, height, pix_f, rng0)

    z = jnp.zeros(sh, f32)
    one = jnp.ones(sh, f32)
    st = WB.WaveState(
        ox=o.x.reshape(sh), oy=o.y.reshape(sh), oz=o.z.reshape(sh),
        dx=d.x.reshape(sh), dy=d.y.reshape(sh), dz=d.z.reshape(sh),
        tm=tmv.reshape(sh), rng=rng1.reshape(sh),
        tpx=one, tpy=one, tpz=one, radx=z, rady=z, radz=z,
        accx=z, accy=z, accz=z,
        alive=live0.astype(f32).reshape(sh),
        s=samp_f.astype(f32).reshape(sh), bnc=z, wrk=z,
        pix=pix_f.astype(f32).reshape(sh),
        send=samp_f.astype(f32).reshape(sh),   # no in-kernel regen
        strd=one)

    step = functools.partial(WB.wave_bounce, t_min=t_min,
                             max_depth=max_depth, attenuate=attenuate,
                             tile_rows=tile_rows, interpret=interpret)

    def bounce(st, _):
        d_in = (st.dx, st.dy, st.dz)
        out = step(tables, st)
        st2 = out.state
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = WQ._gather_texels(atlas_flat, idx)
        txr = (texel & 0xFF).astype(f32) * inv255
        txg = ((texel >> 8) & 0xFF).astype(f32) * inv255
        txb = ((texel >> 16) & 0xFF).astype(f32) * inv255
        is_alb = out.fix_kind == f32(WB.FIX_ALBEDO)
        is_emit = out.fix_kind == f32(WB.FIX_EMIT)
        st2 = st2._replace(
            tpx=jnp.where(is_alb, st2.tpx * txr, st2.tpx),
            tpy=jnp.where(is_alb, st2.tpy * txg, st2.tpy),
            tpz=jnp.where(is_alb, st2.tpz * txb, st2.tpz),
            accx=jnp.where(is_emit, st2.accx + out.fwx * txr, st2.accx),
            accy=jnp.where(is_emit, st2.accy + out.fwy * txg, st2.accy),
            accz=jnp.where(is_emit, st2.accz + out.fwz * txb, st2.accz),
        )
        rec = (d_in[0], d_in[1], d_in[2], out.win, out.t_hit, texel)
        return st2, rec

    st, recs = jax.lax.scan(bounce, st, None, length=max_depth)
    rad = jnp.stack([st.accx.reshape(-1)[:L], st.accy.reshape(-1)[:L],
                     st.accz.reshape(-1)[:L]], axis=-1)
    res = Residuals(dx=recs[0], dy=recs[1], dz=recs[2], win=recs[3],
                    t=recs[4], texel=recs[5])
    return rad, res


# ---------------------------------------------------------------------------
# Winner-only differentiable replay (jnp)
# ---------------------------------------------------------------------------

def _scan_maps(scene: T.Scene):
    """scan id -> class-local row, one int table per class (detached)."""
    def mk(scan, active):
        n = scan.shape[0]
        tab = jnp.zeros((1024,), jnp.int32)
        idx = jnp.where(active, scan, 1023)
        return tab.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return (mk(scene.spheres.scan, scene.spheres.active),
            mk(scene.rects.scan, scene.rects.active),
            mk(scene.triangles.scan, scene.triangles.active),
            mk(scene.media.scan, scene.media.active))


def replay_radiance(scene: T.Scene, cam: Camera, res: Residuals,
                    pix: jnp.ndarray, samp: jnp.ndarray, *,
                    width: int, height: int, max_depth: int,
                    attenuate: bool, t_min: float, seed) -> jnp.ndarray:
    """Differentiable winner-only replay of recorded paths -> (L, 3).
    Values match record_forward's radiance up to reassociation; its
    reverse-mode is the production gradient."""
    L = pix.shape[0]
    rows = res.dx.shape[1]
    lanes = rows * LANE
    f32 = jnp.float32
    seed_u = jnp.asarray(seed).astype(jnp.uint32)

    pix_f = jnp.concatenate([pix, jnp.zeros((lanes - L,), pix.dtype)
                             ]).astype(jnp.uint32)
    samp_f = jnp.concatenate([samp, jnp.zeros((lanes - L,), samp.dtype)
                              ]).astype(jnp.uint32)

    rng0 = rng_mod.splitmix32(pix_f ^ rng_mod.splitmix32(samp_f ^ seed_u))
    rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
    _, o0, d0, _tm = camera_rays(cam, width, height, pix_f, rng0)

    s2sph, s2rect, s2tri, s2med = _scan_maps(scene)
    sph, rect, tri, med = scene.spheres, scene.rects, scene.triangles, \
        scene.media
    mats, texs = scene.materials, scene.textures

    def seg(k, ox, oy, oz, dx, dy, dz, tp, rad, alive):
        """One recorded bounce, winner-only, differentiable."""
        win = SG(res.win[k].reshape(-1))
        t_rec = SG(res.t[k].reshape(-1))
        d_next = (SG(res.dx[(k + 1) % max_depth].reshape(-1)),
                  SG(res.dy[(k + 1) % max_depth].reshape(-1)),
                  SG(res.dz[(k + 1) % max_depth].reshape(-1)))
        texel = SG(res.texel[k].reshape(-1))

        enc = jnp.maximum(win - 1.0, 0.0)    # win = encoded + 1; 0 = dead
        term = jnp.floor(enc * f32(1.0 / 4096.0))
        rem = enc - term * 4096.0
        cls = jnp.floor(rem * f32(1.0 / 1024.0))
        scan = (rem - cls * 1024.0).astype(jnp.int32)
        hit = alive & (term != 1.0)          # term 1 = sky miss
        cont = alive & (term == 0.0)

        a = dx * dx + dy * dy + dz * dz
        a_safe = jnp.where(a == 0.0, 1.0, a)
        inv_len = jax.lax.rsqrt(a_safe)
        udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len
        tmv = SG(_tm)  # camera time; differentiable part handled at k=0

        # ---- winner t + normal per class (gather ONLY the winner) --------
        i_s = jnp.take(s2sph, scan, mode="clip")
        i_r = jnp.take(s2rect, scan, mode="clip")
        i_t = jnp.take(s2tri, scan, mode="clip")
        i_m = jnp.take(s2med, scan, mode="clip")
        g = lambda arr, i: jnp.take(arr, i, mode="clip")

        # sphere (moving center at tm, sphere.hpp:26-117)
        c0x, c0y, c0z = g(sph.c0.x, i_s), g(sph.c0.y, i_s), g(sph.c0.z, i_s)
        c1x, c1y, c1z = g(sph.c1.x, i_s), g(sph.c1.y, i_s), g(sph.c1.z, i_s)
        st0, st1 = g(sph.time0, i_s), g(sph.time1, i_s)
        srad = g(sph.radius, i_s)
        dt_ = st1 - st0
        frac = jnp.where(dt_ == 0.0, 0.0,
                         (tmv - st0) / jnp.where(dt_ == 0.0, 1.0, dt_))
        cx = c0x + frac * (c1x - c0x)
        cy = c0y + frac * (c1y - c0y)
        cz = c0z + frac * (c1z - c0z)
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - srad * srad
        disc = b * b - a_safe * cc
        # sqrt(0) has an infinite derivative; masked lanes (clipped
        # gathers, non-sphere winners) would turn it into NaN cotangents
        pos = SG(disc > 0.0)
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos.astype(jnp.float32)
        k1 = (-b - sq) / a_safe
        k2 = (-b + sq) / a_safe
        pick1 = SG(jnp.abs(k1 - t_rec) <= jnp.abs(k2 - t_rec))
        t_sph = jnp.where(pick1, k1, k2)

        # rect: t = (k - o_ax)/d_ax (rectangle.hpp)
        rax = SG(g(rect.axis, i_r))
        rk = g(rect.k, i_r)
        is_xy = rax == T.RECT_XY
        is_xz = rax == T.RECT_XZ
        o_ax = jnp.where(is_xy, oz, jnp.where(is_xz, oy, ox))
        d_ax = jnp.where(is_xy, dz, jnp.where(is_xz, dy, dx))
        d_ax = jnp.where(d_ax == 0.0, 1.0, d_ax)
        t_rect = (rk - o_ax) / d_ax

        # triangle (Moller-Trumbore)
        v0x, v0y, v0z = g(tri.v0.x, i_t), g(tri.v0.y, i_t), g(tri.v0.z, i_t)
        e1x = g(tri.v1.x, i_t) - v0x
        e1y = g(tri.v1.y, i_t) - v0y
        e1z = g(tri.v1.z, i_t) - v0z
        e2x = g(tri.v2.x, i_t) - v0x
        e2y = g(tri.v2.y, i_t) - v0y
        e2z = g(tri.v2.z, i_t) - v0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det = jnp.where(det == 0.0, 1.0, det)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) / det

        # medium event (constant_medium.hpp:28-77): t = t1c + nid*logu/|d|
        mb = SG(g(med.btype, i_m))
        mcx, mcy, mcz = g(med.c.x, i_m), g(med.c.y, i_m), g(med.c.z, i_m)
        mr = g(med.r, i_m)
        mocx, mocy, mocz = ox - mcx, oy - mcy, oz - mcz
        mbq = mocx * dx + mocy * dy + mocz * dz
        mcc = mocx * mocx + mocy * mocy + mocz * mocz - mr * mr
        mdisc = mbq * mbq - a_safe * mcc
        mpos = SG(mdisc > 0.0)
        msq = jnp.sqrt(jnp.where(mpos, mdisc, 1.0))             * mpos.astype(jnp.float32)
        ment_s = (-mbq - msq) / a_safe
        pmnx, pmny, pmnz = g(med.pmin.x, i_m), g(med.pmin.y, i_m), \
            g(med.pmin.z, i_m)
        pmxx, pmxy, pmxz = g(med.pmax.x, i_m), g(med.pmax.y, i_m), \
            g(med.pmax.z, i_m)
        ent_b = jnp.full_like(a, jnp.inf)
        for kk_, ov, dv, oav, dav, a0_, a1_, obv, dbv, b0_, b1_ in (
            (pmxz, oz, dz, ox, dx, pmnx, pmxx, oy, dy, pmny, pmxy),
            (pmnz, oz, dz, ox, dx, pmnx, pmxx, oy, dy, pmny, pmxy),
            (pmxy, oy, dy, ox, dx, pmnx, pmxx, oz, dz, pmnz, pmxz),
            (pmny, oy, dy, ox, dx, pmnx, pmxx, oz, dz, pmnz, pmxz),
            (pmxx, ox, dx, oy, dy, pmny, pmxy, oz, dz, pmnz, pmxz),
            (pmnx, ox, dx, oy, dy, pmny, pmxy, oz, dz, pmnz, pmxz),
        ):
            dv_ = jnp.where(dv == 0.0, 1.0, dv)
            tt = (kk_ - ov) / dv_
            av = oav + tt * dav
            bv = obv + tt * dbv
            okb = SG((av >= a0_) & (av <= a1_) & (bv >= b0_) & (bv <= b1_)
                     & (dv != 0.0))
            ent_b = jnp.minimum(ent_b, jnp.where(okb, tt, jnp.inf))
        ment = jnp.where(mb == T.MED_BOUND_BOX, ent_b, ment_s)
        t1c = jnp.maximum(jnp.maximum(ment, f32(t_min)), 0.0)
        t1c = jnp.where(jnp.isfinite(t1c), t1c, 0.0)
        ray_len = jnp.sqrt(a_safe)
        nid = g(med.neg_inv_density, i_m)
        nid_safe = jnp.where(nid == 0.0, -1.0, nid)
        logu = SG((t_rec - t1c) * ray_len / nid_safe)
        t_med = t1c + nid_safe * logu * inv_len

        is_s = cls == 0.0
        is_r = cls == 1.0
        is_t = cls == 2.0
        is_m = cls == 3.0
        t_hit = jnp.where(is_s, t_sph, jnp.where(is_r, t_rect, jnp.where(
            is_t, t_tri, t_med)))
        t_hit = jnp.where(hit, t_hit, 0.0)
        px_ = ox + t_hit * dx
        py_ = oy + t_hit * dy
        pz_ = oz + t_hit * dz

        # normal (front-flipped with the recorded orientation)
        srad_safe = jnp.where(srad == 0.0, 1.0, srad)
        n_sx = (px_ - cx) / srad_safe
        n_sy = (py_ - cy) / srad_safe
        n_sz = (pz_ - cz) / srad_safe
        n_rx = jnp.where(rax == T.RECT_YZ, 1.0, 0.0)
        n_ry = jnp.where(rax == T.RECT_XZ, 1.0, 0.0)
        n_rz = jnp.where(rax == T.RECT_XY, 1.0, 0.0)
        n_tx = e1y * e2z - e1z * e2y
        n_ty = e1z * e2x - e1x * e2z
        n_tz = e1x * e2y - e1y * e2x
        nx = jnp.where(is_s, n_sx, jnp.where(is_r, n_rx, jnp.where(
            is_t, n_tx, 1.0)))
        ny = jnp.where(is_s, n_sy, jnp.where(is_r, n_ry, jnp.where(
            is_t, n_ty, 0.0)))
        nz = jnp.where(is_s, n_sz, jnp.where(is_r, n_rz, jnp.where(
            is_t, n_tz, 0.0)))
        front = SG(is_m | ((dx * nx + dy * ny + dz * nz) < 0.0))
        fsign = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = nx * fsign, ny * fsign, nz * fsign

        # ---- winner material + albedo ------------------------------------
        mat_i = SG(jnp.where(is_s, g(sph.mat, i_s).astype(f32), jnp.where(
            is_r, g(rect.mat, i_r).astype(f32), jnp.where(
                is_t, g(tri.mat, i_t).astype(f32),
                g(med.mat, i_m).astype(f32)))).astype(jnp.int32))
        mtype = SG(g(mats.mtype, mat_i))
        mpar = g(mats.param, mat_i)
        mcolx, mcoly, mcolz = g(mats.color.x, mat_i), \
            g(mats.color.y, mat_i), g(mats.color.z, mat_i)
        tex_i = SG(g(mats.tex, mat_i))
        ttype = SG(g(texs.ttype, tex_i))
        c1x_, c1y_, c1z_ = g(texs.c1.x, tex_i), g(texs.c1.y, tex_i), \
            g(texs.c1.z, tex_i)
        c2x_, c2y_, c2z_ = g(texs.c2.x, tex_i), g(texs.c2.y, tex_i), \
            g(texs.c2.z, tex_i)
        odd = SG(jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                 * jnp.sin(10.0 * pz_) < 0.0)
        txr = (texel & 0xFF).astype(f32) * f32(1.0 / 255.0)
        txg = ((texel >> 8) & 0xFF).astype(f32) * f32(1.0 / 255.0)
        txb = ((texel >> 16) & 0xFF).astype(f32) * f32(1.0 / 255.0)
        is_plain = (mtype == T.MAT_METAL) | (mtype == T.MAT_DIELECTRIC)
        alb_x = jnp.where(ttype == T.TEX_CHECKER,
                          jnp.where(odd, c1x_, c2x_),
                          jnp.where(ttype == T.TEX_IMAGE, txr, c1x_))
        alb_y = jnp.where(ttype == T.TEX_CHECKER,
                          jnp.where(odd, c1y_, c2y_),
                          jnp.where(ttype == T.TEX_IMAGE, txg, c1y_))
        alb_z = jnp.where(ttype == T.TEX_CHECKER,
                          jnp.where(odd, c1z_, c2z_),
                          jnp.where(ttype == T.TEX_IMAGE, txb, c1z_))
        alb_x = jnp.where(is_plain, mcolx, alb_x)
        alb_y = jnp.where(is_plain, mcoly, alb_y)
        alb_z = jnp.where(is_plain, mcolz, alb_z)

        # ---- scatter reconstruction (detached draws) ---------------------
        is_lam = mtype == T.MAT_LAMBERTIAN
        is_metal = mtype == T.MAT_METAL
        is_diel = mtype == T.MAT_DIELECTRIC
        is_light = mtype == T.MAT_LIGHT

        ud_dot_n = udx * nx + udy * ny + udz * nz
        rfl_x = udx - 2.0 * ud_dot_n * nx
        rfl_y = udy - 2.0 * ud_dot_n * ny
        rfl_z = udz - 2.0 * ud_dot_n * nz

        # lambertian: d' = n + unit (unit detached from the record)
        ulx = d_next[0] - SG(nx)
        uly = d_next[1] - SG(ny)
        ulz = d_next[2] - SG(nz)
        dl_x, dl_y, dl_z = nx + ulx, ny + uly, nz + ulz

        # metal: d' = reflect + fuzz * ball
        fz = mpar
        fz_safe = SG(jnp.where(fz == 0.0, 1.0, fz))
        bx = SG((d_next[0] - rfl_x) / fz_safe)
        by = SG((d_next[1] - rfl_y) / fz_safe)
        bz = SG((d_next[2] - rfl_z) / fz_safe)
        dm_x, dm_y, dm_z = rfl_x + fz * bx, rfl_y + fz * by, rfl_z + fz * bz

        # dielectric: pinned branch, refract differentiable in ior/n
        ior = jnp.where(is_diel, mpar, 1.5)
        ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-ud_dot_n, 1.0)
        chose_reflect = SG(
            (d_next[0] * nx + d_next[1] * ny + d_next[2] * nz) > 0.0)
        rp_x = (udx + cos_t * nx) * ratio
        rp_y = (udy + cos_t * ny) * ratio
        rp_z = (udz + cos_t * nz) * ratio
        rp_sq = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
        rps = jnp.abs(1.0 - rp_sq)
        rpos = SG(rps > 0.0)
        rpar_ = -jnp.sqrt(jnp.where(rpos, rps, 1.0))             * rpos.astype(jnp.float32)
        rr_x = rp_x + rpar_ * nx
        rr_y = rp_y + rpar_ * ny
        rr_z = rp_z + rpar_ * nz
        dd_x = jnp.where(chose_reflect, rfl_x, rr_x)
        dd_y = jnp.where(chose_reflect, rfl_y, rr_y)
        dd_z = jnp.where(chose_reflect, rfl_z, rr_z)

        nd_x = jnp.where(is_lam, dl_x, jnp.where(is_metal, dm_x, jnp.where(
            is_diel, dd_x, d_next[0])))
        nd_y = jnp.where(is_lam, dl_y, jnp.where(is_metal, dm_y, jnp.where(
            is_diel, dd_y, d_next[1])))
        nd_z = jnp.where(is_lam, dl_z, jnp.where(is_metal, dm_z, jnp.where(
            is_diel, dd_z, d_next[2])))

        # ---- radiance terms ----------------------------------------------
        sky_tv = 0.5 * (udy + 1.0)
        skyx = 1.0 - sky_tv + sky_tv * f32(0.5)
        skyy = 1.0 - sky_tv + sky_tv * f32(0.7)
        skyz = 1.0 - sky_tv + sky_tv * f32(1.0)
        miss = alive & (term == 1.0)
        stop_em = alive & (term == 2.0)
        radx = rad[0] + jnp.where(miss, tp[0] * skyx, 0.0)
        rady = rad[1] + jnp.where(miss, tp[1] * skyy, 0.0)
        radz = rad[2] + jnp.where(miss, tp[2] * skyz, 0.0)
        if attenuate:
            ewx, ewy, ewz = tp
        else:
            ewx = ewy = ewz = jnp.ones_like(radx)
        radx = radx + jnp.where(stop_em, ewx * alb_x, 0.0)
        rady = rady + jnp.where(stop_em, ewy * alb_y, 0.0)
        radz = radz + jnp.where(stop_em, ewz * alb_z, 0.0)

        att_x = jnp.where(is_light, 1.0, alb_x)
        att_y = jnp.where(is_light, 1.0, alb_y)
        att_z = jnp.where(is_light, 1.0, alb_z)
        tpx = jnp.where(cont, tp[0] * att_x, tp[0])
        tpy = jnp.where(cont, tp[1] * att_y, tp[1])
        tpz = jnp.where(cont, tp[2] * att_z, tp[2])

        ox2 = jnp.where(cont, px_, ox)
        oy2 = jnp.where(cont, py_, oy)
        oz2 = jnp.where(cont, pz_, oz)
        dx2 = jnp.where(cont, nd_x, dx)
        dy2 = jnp.where(cont, nd_y, dy)
        dz2 = jnp.where(cont, nd_z, dz)
        return (ox2, oy2, oz2, dx2, dy2, dz2, (tpx, tpy, tpz),
                (radx, rady, radz), cont)

    ox, oy, oz = o0.x, o0.y, o0.z
    dx, dy, dz = d0.x, d0.y, d0.z
    one = jnp.ones((lanes,), f32)
    zer = jnp.zeros((lanes,), f32)
    tp = (one, one, one)
    rad = (zer, zer, zer)
    alive = jnp.arange(lanes) < L
    for k in range(max_depth):
        ox, oy, oz, dx, dy, dz, tp, rad, alive = seg(
            k, ox, oy, oz, dx, dy, dz, tp, rad, alive)
    return jnp.stack([rad[0][:L], rad[1][:L], rad[2][:L]], axis=-1)


# ---------------------------------------------------------------------------
# custom_vjp glue
# ---------------------------------------------------------------------------

def render_grad_fn(width: int, height: int, *, max_depth: int = 8,
                   attenuate: bool = True, t_min: float = 1e-3,
                   seed: int = 0, tile_rows: int = None,
                   interpret: bool = None):
    """Build `f(scene, cam, pix, samp) -> (L, 3)` whose forward runs the
    pallas megakernel and whose VJP runs the winner-only replay.

    Unlike `make_render_grad`, `pix`/`samp` are runtime ARGUMENTS (float
    arrays of exact small ints, zero cotangent) so the same compiled `f`
    serves every shard of a `shard_map` training step — the composition
    the distributed train step uses (parallel.mesh.make_train_step
    backend="pallas")."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = 8 if interpret else 32
    cfg = dict(max_depth=max_depth, attenuate=attenuate, t_min=t_min,
               seed=seed)

    @jax.custom_vjp
    def f(scene, cam, pix, samp):
        rad, _ = record_forward(scene, cam, width, height, pix, samp,
                                tile_rows=tile_rows, interpret=interpret,
                                **cfg)
        return rad

    def fwd(scene, cam, pix, samp):
        rad, res = record_forward(scene, cam, width, height, pix, samp,
                                  tile_rows=tile_rows, interpret=interpret,
                                  **cfg)
        return rad, (scene, cam, res, pix, samp)

    def bwd(saved, g):
        scene, cam, res, pix, samp = saved
        _, vjp_fn = jax.vjp(
            lambda s, c: replay_radiance(
                s, c, res, pix, samp, width=width, height=height, **cfg),
            scene, cam)
        ds, dc = vjp_fn(g)
        return ds, dc, jnp.zeros_like(pix), jnp.zeros_like(samp)

    f.defvjp(fwd, bwd)
    return f


def make_render_grad(width: int, height: int, pix: jnp.ndarray,
                     samp: jnp.ndarray, *, max_depth: int = 8,
                     attenuate: bool = True, t_min: float = 1e-3,
                     seed: int = 0, tile_rows: int = None,
                     interpret: bool = None, queued: bool = True,
                     **queued_kw):
    """Build `f(scene, cam) -> (npx, 3)` per-pixel MEAN radiance over the
    (pix, samp) sample grid — the production gradient entry point.

    `pix`/`samp` must form the canonical grid (pix = tile(pix0, spp) with
    contiguous pix0, samp = repeat(samp0 + arange(spp), npx)); the fast
    queue-driven route (diff.queued_vjp) requires that structure.  Pass
    queued=False for the r4 pixel-pinned route (exact same estimator,
    ~100x slower backward — kept as a cross-check oracle)."""
    import numpy as np
    pix_np = np.asarray(pix).astype(np.int64)
    samp_np = np.asarray(samp).astype(np.int64)
    L = pix_np.shape[0]
    u = np.unique(samp_np)
    spp = len(u)
    npx = L // spp
    grid_ok = (
        npx * spp == L
        and np.array_equal(u, u[0] + np.arange(spp))
        and np.array_equal(samp_np, np.repeat(u, npx))
        and np.array_equal(pix_np,
                           np.tile(pix_np[0] + np.arange(npx), spp)))
    if not grid_ok:
        raise ValueError(
            "make_render_grad needs the canonical (pix, samp) grid "
            "(tile(contiguous_pix, spp) / repeat(consecutive_samp, npx)); "
            "use render_grad_fn for arbitrary sample lists")
    if queued:
        from .queued_vjp import render_grad_fb
        fq = render_grad_fb(width, height, npx, spp, max_depth=max_depth,
                            attenuate=attenuate, t_min=t_min, seed=seed,
                            tile_rows=tile_rows, interpret=interpret,
                            **queued_kw)
        pb = jnp.float32(int(pix_np[0]))
        sb = jnp.float32(int(u[0]))
        return lambda scene, cam: fq(scene, cam, pb, sb)
    g = render_grad_fn(width, height, max_depth=max_depth,
                       attenuate=attenuate, t_min=t_min, seed=seed,
                       tile_rows=tile_rows, interpret=interpret)
    pix_f = jnp.asarray(pix, jnp.float32)
    samp_f = jnp.asarray(samp, jnp.float32)

    def f(scene, cam):
        rad = g(scene, cam, pix_f, samp_f)           # (L, 3) per-sample
        return jnp.mean(rad.reshape(spp, npx, 3), axis=0)
    return f
