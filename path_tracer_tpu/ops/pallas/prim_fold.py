"""Pallas TPU megakernel: fused closest-hit fold over ALL primitive classes.

One kernel per bounce replaces the jnp path's per-class (N, P) HBM
matrices (spheres 512, rects ~40, triangles ~8 columns): spheres, rects
and triangles fold to per-class winners per ray entirely in VMEM, and the
per-medium prefix minima (closest-so-far at each constant_medium's scan
position, render.hpp:37-49) accumulate over all three classes in the same
pass, so media_events needs no (N, P) matrices either.

Tie semantics (engine.intersect._merge): class tables are packed in scene
scan order, so within a class the reference's scan tie rule reduces to
index order — spheres accept strictly-closer only (sphere.hpp:76, keep
the SMALLEST index among equal-t), rects/triangles use the reject form
(rectangle.hpp:35, triangle.hpp:90, keep the LARGEST).  The cross-class
merge is O(N) and stays in jnp (engine.intersect).

Sphere math is the division-free key fold of sphere_fold.py (key = t*a,
one divide per ray at the end); rect/tri fold in t directly; prefix
minima accumulate in key space.  Layout: rays on sublanes as (BR, 1)
blocks x class tables on lanes — validated bit-exact against the float64
NumPy oracle on v5e (tests run the same kernel in interpret mode on CPU).

Forward-only: the differentiable path uses the jnp kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.vec import Vec3
from ...scene import types as T
from .sphere_fold import LANE, _pack_sphere_table

BR = 256  # rays per program (sublane-major)
BIG = 2.0 ** 30  # Python float: becomes an inline literal when traced


def _pack_rect_table(r: T.Rects) -> jnp.ndarray:
    """(15, P_pad) f32 rect table.  Rows 0-2: k-axis one-hot; 3-5: a-axis
    one-hot; 6-8: b-axis one-hot; 9: k; 10-13: a0 a1 b0 b1; 14: scan.
    Inactive/padding rects get inverted bounds so nothing hits."""
    p = r.k.shape[0]
    p_pad = max(LANE, -(-p // LANE) * LANE)
    is_xy = r.axis == T.RECT_XY
    is_xz = r.axis == T.RECT_XZ
    is_yz = r.axis == T.RECT_YZ
    f = lambda m: m.astype(jnp.float32)
    zero = jnp.zeros_like(f(is_xy))
    rows = [
        f(is_yz), f(is_xz), f(is_xy),            # k-axis: x | y | z
        f(is_xy) + f(is_xz), f(is_yz), zero,     # a-axis: x for xy/xz, y for yz
        zero, f(is_xy), f(is_xz) + f(is_yz),     # b-axis: y for xy, z for xz/yz
        r.k.astype(jnp.float32),
        jnp.where(r.active, r.a0, 1.0), jnp.where(r.active, r.a1, 0.0),
        jnp.where(r.active, r.b0, 1.0), jnp.where(r.active, r.b1, 0.0),
        r.scan.astype(jnp.float32),
    ]
    return jnp.stack(
        [jnp.pad(c.astype(jnp.float32), (0, p_pad - p),
                 constant_values=(1.0 if i in (10, 12) else 0.0))
         for i, c in enumerate(rows)], axis=0)


def _pack_tri_table(tr: T.Triangles) -> jnp.ndarray:
    """(11, P_pad) f32 triangle table: v0(3) e1(3) e2(3) scan active."""
    p = tr.mat.shape[0]
    p_pad = max(LANE, -(-p // LANE) * LANE)
    e1 = tr.v1 - tr.v0
    e2 = tr.v2 - tr.v0
    rows = [tr.v0.x, tr.v0.y, tr.v0.z, e1.x, e1.y, e1.z,
            e2.x, e2.y, e2.z, tr.scan.astype(jnp.float32),
            tr.active.astype(jnp.float32)]
    return jnp.stack([jnp.pad(c.astype(jnp.float32), (0, p_pad - p))
                      for c in rows], axis=0)


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, rt_ref,
            stab_ref, rtab_ref, ttab_ref, med_scan_ref,
            st_ref, sidx_ref, rt_ref_o, ridx_ref, tt_ref, tidx_ref,
            pref_ref, *,
            ns_blocks: int, nr_blocks: int, nt_blocks: int, n_media: int,
            t_min: float):
    ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    rt = rt_ref[:, :]

    a = dx * dx + (dy * dy + dz * dz)          # (BR, 1), > 0
    tmin = jnp.float32(t_min)
    tmin_a = tmin * a
    inf = jnp.float32(jnp.inf)
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (BR, LANE), 1).astype(jnp.float32)

    prefs = [jnp.full((BR, LANE), inf, jnp.float32)
             for _ in range(n_media)]

    # ---- sphere fold (key = t*a space; first-min / smallest idx) ------
    best_key = jnp.full((BR, LANE), inf, jnp.float32)
    best_blk = jnp.zeros((BR, LANE), jnp.float32)
    for blk in range(ns_blocks):
        sl = slice(blk * LANE, (blk + 1) * LANE)
        col = lambda c: stab_ref[c:c + 1, sl]
        k = (rt - col(7)) * col(8)
        ocx = ox - (col(0) + k * col(3))
        ocy = oy - (col(1) + k * col(4))
        ocz = oz - (col(2) + k * col(5))
        b = ocx * dx + (ocy * dy + ocz * dz)
        cc = ocx * ocx + (ocy * ocy + ocz * ocz) - col(6)
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        key1 = -b - sq
        key2 = -b + sq
        ok1 = has & (key1 > tmin_a)
        ok2 = has & (key2 > tmin_a)
        key = jnp.where(ok1, key1, jnp.where(ok2, key2, inf))
        better = key < best_key                # strict: first-min wins
        best_key = jnp.where(better, key, best_key)
        best_blk = jnp.where(better, jnp.float32(blk), best_blk)
        for m in range(n_media):
            in_pre = col(9) < med_scan_ref[m]
            prefs[m] = jnp.minimum(prefs[m], jnp.where(in_pre, key, inf))
    key_star = jnp.min(best_key, axis=1, keepdims=True)
    sph_idx_mat = best_blk * jnp.float32(LANE) + lane_f
    cand = jnp.where(best_key == key_star, sph_idx_mat, BIG)
    s_idx = jnp.min(cand, axis=1, keepdims=True)
    s_t = jnp.where(key_star < inf, key_star / a, inf)

    # ---- rect fold (t space; last-min / largest idx wins ties) --------
    r_t = jnp.full((BR, LANE), inf, jnp.float32)
    r_blk = jnp.zeros((BR, LANE), jnp.float32)
    for blk in range(nr_blocks):
        sl = slice(blk * LANE, (blk + 1) * LANE)
        col = lambda c: rtab_ref[c:c + 1, sl]
        o_k = col(0) * ox + (col(1) * oy + col(2) * oz)
        d_k = col(0) * dx + (col(1) * dy + col(2) * dz)
        o_a = col(3) * ox + (col(4) * oy + col(5) * oz)
        d_a = col(3) * dx + (col(4) * dy + col(5) * dz)
        o_b = col(6) * ox + (col(7) * oy + col(8) * oz)
        d_b = col(6) * dx + (col(7) * dy + col(8) * dz)
        t = (col(9) - o_k) / d_k
        av = o_a + t * d_a
        bv = o_b + t * d_b
        in_b = ~((av < col(10)) | (av > col(11))
                 | (bv < col(12)) | (bv > col(13)))
        finite = jnp.abs(t) < BIG               # false for NaN/inf t
        valid = ~(t < tmin) & in_b & finite
        t = jnp.where(valid, t, inf)
        upd = (t <= r_t) & (t < inf)           # non-strict: later replaces
        r_t = jnp.where(upd, t, r_t)
        r_blk = jnp.where(upd, jnp.float32(blk), r_blk)
        for m in range(n_media):
            in_pre = col(14) < med_scan_ref[m]
            prefs[m] = jnp.minimum(prefs[m],
                                   jnp.where(in_pre, t * a, inf))
    rt_star = jnp.min(r_t, axis=1, keepdims=True)
    rect_idx_mat = r_blk * jnp.float32(LANE) + lane_f
    cand_r = jnp.where(r_t == rt_star, rect_idx_mat, -1.0)
    r_idx = jnp.max(cand_r, axis=1, keepdims=True)

    # ---- triangle fold (t space; last-min / largest idx) --------------
    t_t = jnp.full((BR, LANE), inf, jnp.float32)
    t_blk = jnp.zeros((BR, LANE), jnp.float32)
    eps = jnp.float32(1e-7)
    for blk in range(nt_blocks):
        sl = slice(blk * LANE, (blk + 1) * LANE)
        col = lambda c: ttab_ref[c:c + 1, sl]
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        aa = e1x * hx + (e1y * hy + e1z * hz)
        a_abs = jnp.abs(aa)
        a_pos = aa > 0.0
        sx = ox - col(0)
        sy = oy - col(1)
        sz = oz - col(2)
        u = sx * hx + (sy * hy + sz * hz)
        u_ok = ~((u > 0.0) ^ a_pos) & (jnp.abs(u) <= a_abs)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = dx * qx + (dy * qy + dz * qz)
        v_ok = ~((v > 0.0) ^ a_pos) & (jnp.abs(u + v) <= a_abs)
        t = (e2x * qx + (e2y * qy + e2z * qz)) / aa
        valid = ((a_abs >= eps) & u_ok & v_ok & ~(t < tmin)
                 & (col(10) > 0.0))
        t = jnp.where(valid, t, inf)
        upd = (t <= t_t) & (t < inf)
        t_t = jnp.where(upd, t, t_t)
        t_blk = jnp.where(upd, jnp.float32(blk), t_blk)
        for m in range(n_media):
            in_pre = col(9) < med_scan_ref[m]
            prefs[m] = jnp.minimum(prefs[m],
                                   jnp.where(in_pre, t * a, inf))
    tt_star = jnp.min(t_t, axis=1, keepdims=True)
    tri_idx_mat = t_blk * jnp.float32(LANE) + lane_f
    cand_t = jnp.where(t_t == tt_star, tri_idx_mat, -1.0)
    t_idx = jnp.max(cand_t, axis=1, keepdims=True)

    st_ref[:, :] = s_t
    sidx_ref[:, :] = jnp.where(s_idx < BIG, s_idx, 0.0).astype(jnp.int32)
    rt_ref_o[:, :] = rt_star
    ridx_ref[:, :] = jnp.maximum(r_idx, 0.0).astype(jnp.int32)
    tt_ref[:, :] = tt_star
    tidx_ref[:, :] = jnp.maximum(t_idx, 0.0).astype(jnp.int32)
    if n_media:
        cols = [jnp.min(p_, axis=1, keepdims=True) for p_ in prefs]
        pref_ref[:, :] = (jnp.concatenate(cols, axis=1)
                          if len(cols) > 1 else cols[0]) / a
    else:
        pref_ref[:, :] = jnp.full((BR, 1), inf, jnp.float32)


@functools.partial(jax.jit, static_argnums=(4,))
def prim_fold(scene: T.Scene, ro: Vec3, rd: Vec3, rtime: jnp.ndarray,
              t_min: float, med_scans: jnp.ndarray):
    """Per-class closest hits over spheres/rects/triangles for a ray batch.

    Returns (s_t, s_idx, r_t, r_idx, t_t, t_idx, prefix_t): per-class
    winner distance (inf = miss) and table index, plus (M, N) per-medium
    prefix minima over ALL primitive classes with scan < med_scans[m].
    N must be a multiple of 256."""
    n = ro.x.shape[0]
    assert n % BR == 0, f"ray count {n} not a multiple of {BR}"
    g = n // BR
    n_media = int(med_scans.shape[0])
    m_out = max(n_media, 1)

    stab, sp_pad = _pack_sphere_table(scene.spheres)
    rtab = _pack_rect_table(scene.rects)
    ttab = _pack_tri_table(scene.triangles)
    med_in = med_scans.astype(jnp.float32)
    if n_media == 0:
        med_in = jnp.zeros((1,), jnp.float32)

    resh = lambda x: x.reshape(n, 1)
    ray_spec = pl.BlockSpec((BR, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BR, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, ns_blocks=sp_pad // LANE,
        nr_blocks=rtab.shape[1] // LANE, nt_blocks=ttab.shape[1] // LANE,
        n_media=n_media, t_min=float(t_min))
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec] * 6 + [
            pl.BlockSpec((BR, m_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), f32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), f32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), f32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, m_out), f32),
        ],
    )(resh(ro.x), resh(ro.y), resh(ro.z), resh(rd.x), resh(rd.y),
      resh(rd.z), resh(rtime), stab, rtab, ttab, med_in)

    s_t, s_idx, r_t, r_idx, t_t, t_idx, pref = outs
    pref_t = jnp.moveaxis(pref, 1, 0)
    return (s_t.reshape(n), s_idx.reshape(n), r_t.reshape(n),
            r_idx.reshape(n), t_t.reshape(n), t_idx.reshape(n),
            pref_t[:n_media])
