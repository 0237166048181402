"""Branchless vectorized ray-scene intersection.

Replaces the reference's per-ray linear scan with ``dev_visit`` variant
dispatch (``/root/reference/include/render.hpp:30-51``) by class-batched
intersection: for a ray batch of N lanes and a primitive class of P entries we
evaluate the (N, P) hit-distance matrix with pure vectorized math and reduce.

Exactness model vs the reference's sequential closest-hit scan:

* The scan accepts a hit only if strictly closer than closest-so-far
  (render.hpp:40,45 via the ``t < max`` check inside each ``hit``), so the
  winner is the primitive with minimal t, ties broken by scan position (and
  box side order, box.hpp:29-50).  We reproduce that with an argmin whose key
  is lexicographic (t, scan, sub).
* Root selection inside the sphere hit (first root else second,
  sphere.hpp:74-99) is done against the *global* window [t_min, inf) — this is
  provably equivalent to the shrinking-window scan because the two roots are
  ordered (t1 <= t2), so whenever the scan would reject t1 for being beyond
  closest-so-far, t2 is too.
* The smoke medium draws RNG *during* the scan and clamps its interval to
  closest-so-far at its scan position (constant_medium.hpp:28-77).  We
  compute, per medium, the prefix-minimum over primitives with a smaller scan
  index (plus earlier media events) and gate the masked RNG advance on
  exactly the reference's draw condition.

Documented divergences (pathological, measure-zero cases): non-finite
candidate t values (rays axis-parallel in two axes hitting a rect's plane
produce inf*0 NaNs in the reference, UB-ish behavior) are treated as misses.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng as rng_mod
from ..core.vec import Vec3, cross, dot, length, where as vwhere
from ..scene import types as T

# numpy, not jnp: import must not initialize the XLA backend
INF = np.float32(np.inf)
BIG_SCAN = np.int32(2**30)

CLASS_SPHERE = 0
CLASS_RECT = 1
CLASS_TRI = 2
CLASS_MEDIUM = 3


class Hit(NamedTuple):
    """Vectorized hit_record (hitable.hpp:8-24) + material id."""
    hit: jnp.ndarray          # bool (N,)
    t: jnp.ndarray            # f32 (N,)
    p: Vec3                   # hit point
    normal: Vec3              # front-facing normal
    front_face: jnp.ndarray   # bool
    u: jnp.ndarray
    v: jnp.ndarray
    mat: jnp.ndarray          # int32 material id
    cls: jnp.ndarray          # int32 winning primitive class (CLASS_*)


class _Best(NamedTuple):
    t: jnp.ndarray
    scan: jnp.ndarray
    sub: jnp.ndarray
    cls: jnp.ndarray
    idx: jnp.ndarray
    tie: jnp.ndarray   # bool: wins ties when later in scan order (see _merge)


def _col(v: Vec3) -> Vec3:
    """(N,) lanes -> (N,1) for broadcasting against (P,) tables."""
    return Vec3(v.x[:, None], v.y[:, None], v.z[:, None])


def _take_vec(v: Vec3, idx: jnp.ndarray) -> Vec3:
    return Vec3(jnp.take(v.x, idx), jnp.take(v.y, idx), jnp.take(v.z, idx))


def gather_rows(idx: jnp.ndarray, *cols: jnp.ndarray):
    """Fetch per-lane values from several same-length (P,) table columns
    with ONE row gather: stack to (P, C) (loop-invariant, hoisted by XLA)
    and take rows.  On TPU a scalar jnp.take costs as much as a whole-row
    take (~0.1 ms for 16K lanes on v5e), so batching C columns is ~C times
    cheaper — this took intersect_scene from 26 ms to ~2 ms per bounce.
    Integer columns ride along as exact small-int float32s."""
    tab = jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)
    rows = jnp.take(tab, idx, axis=0)
    return [rows[:, i] for i in range(len(cols))]


def _merge(a: _Best, b: _Best) -> _Best:
    """Reproduces the reference scan's replacement rule, including its
    class-dependent tie behavior: spheres accept STRICTLY closer hits
    (sphere.hpp:76 `temp < max`), so a later sphere never wins a t-tie,
    while rects/triangles/media use the reject-form (`t > max` fails at
    equality, rectangle.hpp:35, triangle.hpp:90), so a later such hit
    REPLACES an equal-t best.  Net rule for a tie: the later-scanned entry
    wins iff its `tie` flag is set; otherwise the earlier entry stays."""
    tie_t = b.t == a.t
    b_later = (b.scan > a.scan) | ((b.scan == a.scan) & (b.sub > a.sub))
    b_wins = (b.t < a.t) | (tie_t & jnp.where(b_later, b.tie, ~a.tie))
    pick = lambda x, y: jnp.where(b_wins, y, x)
    return _Best(pick(a.t, b.t), pick(a.scan, b.scan), pick(a.sub, b.sub),
                 pick(a.cls, b.cls), pick(a.idx, b.idx), pick(a.tie, b.tie))


# ---------------------------------------------------------------------------
# Per-class candidate t matrices
# ---------------------------------------------------------------------------

def sphere_t_matrix(s: T.Spheres, ro: Vec3, rd: Vec3, rtime: jnp.ndarray,
                    t_min, t_max) -> jnp.ndarray:
    """(N, P) candidate t for the sphere class (inf = miss).

    sphere.hpp:59-106: quadratic in the unnormalized ray, first root
    preferred.  Moving-sphere center lerp per sphere.hpp:51-56.
    """
    ro, rd = _col(ro), _col(rd)
    rt = rtime[:, None]
    # center(time): static iff time0 == time1 (sphere.hpp:51-56)
    denom = s.time1 - s.time0
    static = denom == 0.0
    k = jnp.where(static, 0.0, (rt - s.time0) / jnp.where(static, 1.0, denom))
    c = Vec3(s.c0.x + k * (s.c1.x - s.c0.x),
             s.c0.y + k * (s.c1.y - s.c0.y),
             s.c0.z + k * (s.c1.z - s.c0.z))
    oc = ro - c
    a = dot(rd, rd)            # (N,1)
    b = dot(oc, rd)            # (N,P)
    cc = dot(oc, oc) - s.radius * s.radius
    disc = b * b - a * cc
    has_roots = disc > 0.0
    # fill 1.0, not 0.0: sqrt(0) has an infinite gradient and the masked
    # lanes would poison the backward pass with inf * 0 = NaN.
    sq = jnp.sqrt(jnp.where(has_roots, disc, 1.0))
    t1 = (-b - sq) / a
    t2 = (-b + sq) / a
    # sphere.hpp:76,92: accept is STRICT `temp < max && temp > min`
    # (unlike rect/triangle which use the reject-form) — NaN t fails both.
    ok1 = (t1 > t_min) & (t1 < t_max)
    ok2 = (t2 > t_min) & (t2 < t_max)
    t = jnp.where(ok1, t1, jnp.where(ok2, t2, INF))
    valid = has_roots & (ok1 | ok2) & s.active
    return jnp.where(valid, t, INF)


def sphere_t_matrix_mxu(s: T.Spheres, ro: Vec3, rd: Vec3,
                        rtime: jnp.ndarray, t_min, t_max) -> jnp.ndarray:
    """MXU-factorized sphere intersection: the quadratic's coefficients
    decompose into four (N,3)@(3,P) matmuls (d.c0, d.dc, o.c0, o.dc) plus
    per-lane and per-sphere scalars —

        b  = o.d - (d.c0 + k d.dc)
        c  = |o|^2 - 2(o.c0 + k o.dc) + |c0|^2 + 2k c0.dc + k^2|dc|^2 - r^2

    which puts the O(N*P*3) contraction on the systolic array and leaves the
    VPU only the per-pair root solve.  Associativity differs from the
    reference's dot(o-c, d) by ulps, so this kernel serves the perf path
    (``exact=False``); parity mode uses sphere_t_matrix.

    Matmuls run at Precision.HIGHEST: the TPU default (one bf16 pass, 8
    mantissa bits) is catastrophic for this factorization — |c|^2-scale
    terms (~3.6e3 for the scene's far sphere) cancel down to O(1) values,
    so bf16 rounding flips hit/miss for ~17% of pairs and moves winners on
    ~half the lanes (measured on v5e).  Note the factorized form is still
    a few ulps worse than the direct oc = o - c kernels even at HIGHEST;
    the pallas fold uses the direct form and is the TPU perf default."""
    d_mat = jnp.stack([rd.x, rd.y, rd.z], axis=1)           # (N, 3)
    o_mat = jnp.stack([ro.x, ro.y, ro.z], axis=1)
    c0 = jnp.stack([s.c0.x, s.c0.y, s.c0.z], axis=0)        # (3, P)
    dc = jnp.stack([s.c1.x - s.c0.x, s.c1.y - s.c0.y,
                    s.c1.z - s.c0.z], axis=0)

    mm = lambda a, b_: jnp.dot(a, b_, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    d_c0 = mm(d_mat, c0)
    d_dc = mm(d_mat, dc)
    o_c0 = mm(o_mat, c0)
    o_dc = mm(o_mat, dc)

    o_d = dot(ro, rd)[:, None]
    d_d = dot(rd, rd)[:, None]
    o_o = dot(ro, ro)[:, None]
    c0_sq = jnp.sum(c0 * c0, axis=0)[None, :]
    c0_dc = jnp.sum(c0 * dc, axis=0)[None, :]
    dc_sq = jnp.sum(dc * dc, axis=0)[None, :]
    r2 = (s.radius * s.radius)[None, :]

    denom = (s.time1 - s.time0)[None, :]
    static = denom == 0.0
    k = jnp.where(static, 0.0,
                  (rtime[:, None] - s.time0[None, :])
                  / jnp.where(static, 1.0, denom))

    b = o_d - (d_c0 + k * d_dc)
    cc = (o_o - 2.0 * (o_c0 + k * o_dc)
          + (c0_sq + 2.0 * k * c0_dc + k * k * dc_sq) - r2)
    disc = b * b - d_d * cc
    has_roots = disc > 0.0
    sq = jnp.sqrt(jnp.where(has_roots, disc, 1.0))
    inv_a = 1.0 / d_d
    t1 = (-b - sq) * inv_a
    t2 = (-b + sq) * inv_a
    ok1 = (t1 > t_min) & (t1 < t_max)
    ok2 = (t2 > t_min) & (t2 < t_max)
    t = jnp.where(ok1, t1, jnp.where(ok2, t2, INF))
    valid = has_roots & (ok1 | ok2) & s.active
    return jnp.where(valid, t, INF)


def rect_t_matrix(r: T.Rects, ro: Vec3, rd: Vec3, t_min, t_max
                  ) -> jnp.ndarray:
    """(N, P) candidate t for rects of all three axes
    (rectangle.hpp:31-49 and siblings): plane solve, bounds test."""
    ro, rd = _col(ro), _col(rd)
    # per-axis component selection (axis: RECT_XY k on z; RECT_XZ on y;
    # RECT_YZ on x); in-plane axes in reference order.
    is_xy = r.axis == T.RECT_XY
    is_xz = r.axis == T.RECT_XZ
    o_k = jnp.where(is_xy, ro.z, jnp.where(is_xz, ro.y, ro.x))
    d_k = jnp.where(is_xy, rd.z, jnp.where(is_xz, rd.y, rd.x))
    o_a = jnp.where(is_xy, ro.x, jnp.where(is_xz, ro.x, ro.y))
    d_a = jnp.where(is_xy, rd.x, jnp.where(is_xz, rd.x, rd.y))
    o_b = jnp.where(is_xy, ro.y, jnp.where(is_xz, ro.z, ro.z))
    d_b = jnp.where(is_xy, rd.y, jnp.where(is_xz, rd.z, rd.z))

    t = (r.k - o_k) / d_k
    in_range = ~((t < t_min) | (t > t_max))
    av = o_a + t * d_a
    bv = o_b + t * d_b
    in_bounds = ~((av < r.a0) | (av > r.a1) | (bv < r.b0) | (bv > r.b1))
    valid = in_range & in_bounds & r.active & jnp.isfinite(t)
    return jnp.where(valid, t, INF)


def triangle_t_matrix(tr: T.Triangles, ro: Vec3, rd: Vec3, t_min, t_max
                      ) -> jnp.ndarray:
    """(N, P) candidate t, Möller–Trumbore with the reference's sign-trick
    early-out conditions as masks (triangle.hpp:58-100, eps=1e-7)."""
    ro, rd = _col(ro), _col(rd)
    e1 = tr.v1 - tr.v0
    e2 = tr.v2 - tr.v0
    h = cross(rd, e2)                       # (N,P) components
    a = dot(e1, h)
    a_abs = jnp.abs(a)
    not_parallel = a_abs >= jnp.float32(1e-7)
    a_pos = a > 0.0
    s = ro - tr.v0
    u = dot(s, h)
    u_ok = ~((u > 0.0) ^ a_pos) & (jnp.abs(u) <= a_abs)
    q = cross(s, e1)
    v = dot(rd, q)
    v_ok = ~((v > 0.0) ^ a_pos) & (jnp.abs(u + v) <= a_abs)
    t = dot(e2, q) / a
    in_range = ~((t < t_min) | (t > t_max))
    valid = not_parallel & u_ok & v_ok & in_range & tr.active
    return jnp.where(valid, t, INF)


def triangle_t_matrix_badouel(tr: T.Triangles, ro: Vec3, rd: Vec3, t_min,
                              t_max) -> jnp.ndarray:
    """(N, P) candidate t, Badouel plane-then-barycentric strategy — the
    reference's alternate compile-time intersector (triangle.hpp:14-56,
    parallel cutoff eps=1e-6, extra `length < 0` reject).  Selectable the
    way the template value parameter selects it (triangle.hpp:103)."""
    ro, rd = _col(ro), _col(rd)
    u = tr.v1 - tr.v0
    v = tr.v2 - tr.v0
    n = cross(u, v)
    w0 = ro - tr.v0
    a = -dot(n, w0)
    b = dot(n, rd)
    not_parallel = jnp.abs(b) >= jnp.float32(1e-6)
    b_safe = jnp.where(not_parallel, b, 1.0)
    t = a / b_safe
    in_range = (t >= 0.0) & ~((t < t_min) | (t > t_max))
    # barycentric via the precomputed dot products (triangle.hpp:39-48)
    hp = ro + rd * t
    uu = dot(u, u)
    uv = dot(u, v)
    vv = dot(v, v)
    w = hp - tr.v0
    wu = dot(w, u)
    wv = dot(w, v)
    D = uv * uv - uu * vv
    D_safe = jnp.where(D == 0.0, 1.0, D)
    s = (uv * wv - vv * wu) / D_safe
    tt = (uv * wu - uu * wv) / D_safe
    inside = ~((s < 0.0) | (s > 1.0) | (tt < 0.0) | (s + tt > 1.0))
    valid = not_parallel & in_range & inside & (D != 0.0) & tr.active
    return jnp.where(valid, t, INF)


TRIANGLE_KERNELS = {
    "moller_trumbore": triangle_t_matrix,   # reference default
    "badouel": triangle_t_matrix_badouel,
}


def _class_best(t_mat: jnp.ndarray, scan: jnp.ndarray, sub: jnp.ndarray,
                cls: int, tie_wins_later: bool) -> _Best:
    """Per-class argmin.  Arrays are packed in scan order, so first
    occurrence = earliest scan entry and last occurrence = latest; classes
    whose accept test passes at equality (rects/triangles) must pick the
    LAST tied minimum, spheres the first."""
    if tie_wins_later:
        p = t_mat.shape[1]
        idx = (p - 1) - jnp.argmin(t_mat[:, ::-1], axis=1)
    else:
        idx = jnp.argmin(t_mat, axis=1)
    t = jnp.min(t_mat, axis=1)   # same value as t_mat[idx]; fuses better
    hit = t < INF
    if sub is not None:
        scan_g, sub_g = gather_rows(idx, scan, sub)
        sub_i = jnp.where(hit, sub_g.astype(jnp.int32), jnp.int32(0))
    else:
        (scan_g,) = gather_rows(idx, scan)
        sub_i = jnp.zeros(t.shape, jnp.int32)
    return _Best(
        t=t,
        scan=jnp.where(hit, scan_g.astype(jnp.int32), BIG_SCAN),
        sub=sub_i,
        cls=jnp.full_like(idx, cls, dtype=jnp.int32).astype(jnp.int32),
        idx=idx.astype(jnp.int32),
        tie=jnp.full(t.shape, tie_wins_later, bool),
    )


# ---------------------------------------------------------------------------
# Constant-medium boundary probing
# ---------------------------------------------------------------------------

def _sphere_boundary_roots(c: Vec3, r, ro: Vec3, rd: Vec3
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Both quadratic roots of a (static) sphere boundary for each lane.
    Returns (hit2, t_entry, t_exit): hit twice with the reference's probing
    sequence (first hit over (-inf, inf) -> t1; second over
    (t1 + 1e-4, inf) -> t2), constant_medium.hpp:34-50."""
    oc = ro - c
    a = dot(rd, rd)
    b = dot(oc, rd)
    cc = dot(oc, oc) - r * r
    disc = b * b - a * cc
    has = disc > 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    t1 = (-b - sq) / a
    t2 = (-b + sq) / a
    # first probe (min=-inf): takes t1 unconditionally when disc>0.
    # second probe (min=t1+1e-4): sphere accept is STRICT `temp > min`
    # (sphere.hpp:76), so t2 must exceed t1 + 1e-4.
    hit2 = has & (t2 > t1 + jnp.float32(1e-4))
    return hit2, t1, t2


def _box_boundary_roots(pmin: Vec3, pmax: Vec3, ro: Vec3, rd: Vec3
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Entry/exit of a box boundary via closest-hit over its 6 rect sides,
    replicating box::hit scan order (box.hpp:20-50) under the two-probe
    sequence of constant_medium.hpp:34-50."""
    NEG_INF = jnp.float32(-jnp.inf)
    ts = []
    sides = [
        # (axis origin comp, dir comp, a comps, b comps, k, bounds)
        (ro.z, rd.z, ro.x, rd.x, ro.y, rd.y, pmax.z, pmin.x, pmax.x, pmin.y, pmax.y),
        (ro.z, rd.z, ro.x, rd.x, ro.y, rd.y, pmin.z, pmin.x, pmax.x, pmin.y, pmax.y),
        (ro.y, rd.y, ro.x, rd.x, ro.z, rd.z, pmax.y, pmin.x, pmax.x, pmin.z, pmax.z),
        (ro.y, rd.y, ro.x, rd.x, ro.z, rd.z, pmin.y, pmin.x, pmax.x, pmin.z, pmax.z),
        (ro.x, rd.x, ro.y, rd.y, ro.z, rd.z, pmax.x, pmin.y, pmax.y, pmin.z, pmax.z),
        (ro.x, rd.x, ro.y, rd.y, ro.z, rd.z, pmin.x, pmin.y, pmax.y, pmin.z, pmax.z),
    ]
    for (ok_, dk_, oa_, da_, ob_, db_, k_, a0_, a1_, b0_, b1_) in sides:
        t = (k_ - ok_) / dk_
        av = oa_ + t * da_
        bv = ob_ + t * db_
        ok = ~((av < a0_) | (av > a1_) | (bv < b0_) | (bv > b1_))
        ok = ok & jnp.isfinite(t)
        ts.append(jnp.where(ok, t, INF))
    tstack = jnp.stack(ts, axis=0)           # (6, N)
    entry = jnp.min(tstack, axis=0)
    hit1 = entry < INF
    # second probe: min = entry + 1e-4; reject t < min (strict)
    second = jnp.where(tstack < entry + jnp.float32(1e-4), INF, tstack)
    exit_t = jnp.min(second, axis=0)
    hit2 = hit1 & (exit_t < INF)
    return hit2, entry, exit_t


def media_events(media: T.Media, ro: Vec3, rd: Vec3,
                 rng_state: jnp.ndarray, prefix: _Best,
                 class_mats, t_min, lane_mask: jnp.ndarray,
                 precomputed_prefix=None
                 ) -> Tuple[jnp.ndarray, _Best]:
    """Process media sequentially in scan order, reproducing
    constant_medium.hpp:28-77 incl. RNG-draw gating.

    ``prefix`` is the best hit among all non-media primitives.
    ``class_mats`` is a list of (t_matrix (N,P), scan (P,)) pairs used to
    compute, per medium, the *restricted* minimum over primitives whose scan
    index is smaller than the medium's — the closest-so-far the reference
    scan would have at the medium's position (render.hpp:37-49).  (The
    restriction of the global argmin is NOT the restricted min, so this must
    re-reduce the t matrices.)  Earlier accepted media events are folded in
    sequentially.  Returns (rng_state, best including media)."""
    n_media = media.r.shape[0]
    best = prefix
    # Media are packed in scan order, so every previously accepted event has
    # a smaller scan index than the current medium — a running min suffices.
    earlier_events_t = jnp.full_like(prefix.t, INF)
    for i in range(n_media):
        c_i = Vec3(media.c.x[i], media.c.y[i], media.c.z[i])
        pmin_i = Vec3(media.pmin.x[i], media.pmin.y[i], media.pmin.z[i])
        pmax_i = Vec3(media.pmax.x[i], media.pmax.y[i], media.pmax.z[i])
        sph2, sph_in, sph_out = _sphere_boundary_roots(c_i, media.r[i], ro, rd)
        box2, box_in, box_out = _box_boundary_roots(pmin_i, pmax_i, ro, rd)
        is_box = media.btype[i] == T.MED_BOUND_BOX
        hit2 = jnp.where(is_box, box2, sph2) & media.active[i]
        t_in = jnp.where(is_box, box_in, sph_in)
        t_out = jnp.where(is_box, box_out, sph_out)

        # closest-so-far at this medium's scan position: restricted min over
        # prims with smaller scan index + earlier accepted media events.
        med_scan = media.scan[i]
        pre_t = jnp.full_like(prefix.t, INF)
        for t_mat, scan_arr in class_mats:
            restricted = jnp.where((scan_arr < med_scan)[None, :], t_mat, INF)
            pre_t = jnp.minimum(pre_t, jnp.min(restricted, axis=1))
        if precomputed_prefix is not None:
            # (M, N) per-medium restricted minima from the pallas fold
            pre_t = jnp.minimum(pre_t, precomputed_prefix[i])
        pre_t = jnp.minimum(pre_t, earlier_events_t)

        # clamp interval (constant_medium.hpp:52-59): rec1 up to global
        # t_min, rec2 down to closest-so-far; reject if inverted.
        t1c = jnp.maximum(t_in, jnp.float32(t_min))
        t1c = jnp.maximum(t1c, 0.0)   # `if (rec1.t < 0) rec1.t = 0`
        t2c = jnp.minimum(t_out, pre_t)
        interval_ok = ~(t1c >= t2c)

        draw_mask = lane_mask & hit2 & interval_ok
        rng_state, uni = rng_mod.next_f01(rng_state, draw_mask)
        # masked lanes carry garbage uni (possibly 0); keep log() finite so
        # the backward pass w.r.t. neg_inv_density stays NaN-free.
        uni = jnp.where(draw_mask, uni, 0.5)

        ray_len = length(rd)
        dist_inside = (t2c - t1c) * ray_len
        hit_distance = media.neg_inv_density[i] * jnp.log(uni)
        accept = draw_mask & ~(hit_distance > dist_inside)
        t_e = t1c + hit_distance / ray_len
        cand = _Best(
            t=jnp.where(accept, t_e, INF),
            scan=jnp.where(accept, med_scan, BIG_SCAN),
            sub=jnp.zeros_like(prefix.sub),
            cls=jnp.full_like(prefix.cls, CLASS_MEDIUM),
            idx=jnp.full_like(prefix.idx, i),
            # the medium's caller replaces closest-so-far whenever hit()
            # returns true, and its event t may equal the clamped bound —
            # later-equal wins like the reject-form classes.
            tie=jnp.ones(prefix.t.shape, bool),
        )
        best = _merge(best, cand)
        earlier_events_t = jnp.where(
            accept, jnp.minimum(earlier_events_t, t_e), earlier_events_t)
    return rng_state, best


# ---------------------------------------------------------------------------
# Winner record reconstruction
# ---------------------------------------------------------------------------

def _set_face_normal(rd: Vec3, outward: Vec3
                     ) -> Tuple[jnp.ndarray, Vec3]:
    """hitable.hpp:20-23."""
    front = dot(rd, outward) < 0.0
    return front, vwhere(front, outward, -outward)


def _mercator(n: Vec3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sphere.hpp:13-24 — uv from the (face-flipped) normal."""
    pi = jnp.float32(rng_mod.PI)
    # arctan2 has NaN partials at (0, 0) — substitute a safe x for the
    # degenerate (masked) lanes.
    degenerate = (n.x == 0.0) & (n.z == 0.0)
    phi = jnp.arctan2(n.z, jnp.where(degenerate, 1.0, n.x))
    y = jnp.clip(n.y, -1.0, 1.0)
    interior = jnp.abs(y) < 1.0
    theta = jnp.where(interior,
                      jnp.arcsin(jnp.where(interior, y, 0.0)),
                      jnp.sign(y) * (pi / 2.0))
    u = 1.0 - (phi + pi) / (2.0 * pi)
    v = (theta + pi / 2.0) / pi
    return u, v


def build_hit(scene: T.Scene, best: _Best, ro: Vec3, rd: Vec3,
              rtime: jnp.ndarray) -> Hit:
    """Reconstruct the winner's hit record with the exact per-type formulas
    (only O(N) work — the (N,P) pass produced just t/scan/idx)."""
    N = best.t.shape[0]
    hit = best.t < INF
    t = jnp.where(hit, best.t, 0.0)
    p = ro + rd * t   # ray::at, ray.hpp:21

    idx = best.idx
    # --- sphere record (sphere.hpp:74-99) ---
    s = scene.spheres
    si = jnp.clip(idx, 0, s.radius.shape[0] - 1)
    (sc0x, sc0y, sc0z, sc1x, sc1y, sc1z, srad, st0, st1,
     mat_s) = gather_rows(si, s.c0.x, s.c0.y, s.c0.z, s.c1.x, s.c1.y,
                          s.c1.z, s.radius, s.time0, s.time1, s.mat)
    denom = st1 - st0
    static = denom == 0.0
    k = jnp.where(static, 0.0,
                  (rtime - st0) / jnp.where(static, 1.0, denom))
    sc0 = Vec3(sc0x, sc0y, sc0z)
    sc1 = Vec3(sc1x, sc1y, sc1z)
    c = sc0 + (sc1 - sc0) * k
    # lanes whose winner is another class (or a miss) may gather a PADDED
    # sphere row with radius 0 — dividing by it makes inf/NaN that poisons
    # the backward pass even though the record is masked out.
    srad_safe = jnp.where(srad == 0.0, 1.0, srad)
    outward_s = (p - c) / srad_safe
    front_s, n_s = _set_face_normal(rd, outward_s)
    u_s, v_s = _mercator(n_s)

    # --- rect record (rectangle.hpp:31-49) ---
    r = scene.rects
    ri = jnp.clip(idx, 0, r.k.shape[0] - 1)
    axis, a0, a1, b0, b1, mat_r = gather_rows(
        ri, r.axis, r.a0, r.a1, r.b0, r.b1, r.mat)
    is_xy = axis == T.RECT_XY
    is_xz = axis == T.RECT_XZ
    o_a = jnp.where(is_xy, ro.x, jnp.where(is_xz, ro.x, ro.y))
    d_a = jnp.where(is_xy, rd.x, jnp.where(is_xz, rd.x, rd.y))
    o_b = jnp.where(is_xy, ro.y, jnp.where(is_xz, ro.z, ro.z))
    d_b = jnp.where(is_xy, rd.y, jnp.where(is_xz, rd.z, rd.z))
    av = o_a + t * d_a
    bv = o_b + t * d_b
    u_r = (av - a0) / (a1 - a0)
    v_r = (bv - b0) / (b1 - b0)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    outward_r = Vec3(jnp.where(is_xy | is_xz, zero, one),
                     jnp.where(is_xz, one, zero),
                     jnp.where(is_xy, one, zero))
    front_r, n_r = _set_face_normal(rd, outward_r)

    # --- triangle record (triangle.hpp:94-99; u,v stale in reference,
    # we define them as 0) ---
    tr = scene.triangles
    ti = jnp.clip(idx, 0, tr.mat.shape[0] - 1)
    (t0x, t0y, t0z, t1x, t1y, t1z, t2x, t2y, t2z, mat_t) = gather_rows(
        ti, tr.v0.x, tr.v0.y, tr.v0.z, tr.v1.x, tr.v1.y, tr.v1.z,
        tr.v2.x, tr.v2.y, tr.v2.z, tr.mat)
    tv0 = Vec3(t0x, t0y, t0z)
    tv1 = Vec3(t1x, t1y, t1z)
    tv2 = Vec3(t2x, t2y, t2z)
    outward_t = cross(tv1 - tv0, tv2 - tv0)
    front_t, n_t = _set_face_normal(rd, outward_t)

    # --- medium record (constant_medium.hpp:72-76): arbitrary normal
    # (1,0,0), front_face true, material = phase function ---
    m = scene.media
    mi = jnp.clip(idx, 0, m.mat.shape[0] - 1)
    mat_m = jnp.take(m.mat, mi).astype(jnp.float32)

    cls = best.cls
    is_s = cls == CLASS_SPHERE
    is_r = cls == CLASS_RECT
    is_t = cls == CLASS_TRI

    def sel(a, b, c_, d_):
        return jnp.where(is_s, a, jnp.where(is_r, b, jnp.where(is_t, c_, d_)))

    normal = Vec3(sel(n_s.x, n_r.x, n_t.x, 1.0),
                  sel(n_s.y, n_r.y, n_t.y, 0.0),
                  sel(n_s.z, n_r.z, n_t.z, 0.0))
    front = sel(front_s, front_r, front_t, True)
    u = sel(u_s, u_r, 0.0, 0.0)
    v = sel(v_s, v_r, 0.0, 0.0)
    mat = sel(mat_s, mat_r, mat_t, mat_m).astype(jnp.int32)

    return Hit(hit=hit, t=t, p=p, normal=normal, front_face=front,
               u=u, v=v, mat=jnp.where(hit, mat, 0), cls=cls)


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------

def intersect_scene(scene: T.Scene, ro: Vec3, rd: Vec3, rtime: jnp.ndarray,
                    rng_state: jnp.ndarray, lane_mask: jnp.ndarray,
                    t_min: float = 1e-3, exact: bool = True,
                    triangle_algorithm: str = "moller_trumbore"
                    ) -> Tuple[jnp.ndarray, Hit]:
    """hit_world (render.hpp:30-51) for a ray batch.  ``lane_mask`` gates the
    media RNG draws for dead lanes (their streams must not advance).

    exact=True uses the reference-associativity sphere kernel (parity mode);
    exact=False uses the MXU-factorized kernel (ulp-level deviations).
    (The retired prim_fold pallas branch was deleted in r4: the production
    renderer is the wq megakernel; this jnp path is the oracle/parity
    engine.)"""
    t_min_py = float(t_min)
    t_min = jnp.float32(t_min)
    sph_kernel = sphere_t_matrix if exact else sphere_t_matrix_mxu
    ts = sph_kernel(scene.spheres, ro, rd, rtime, t_min, INF)
    best_s = _class_best(ts, scene.spheres.scan, None, CLASS_SPHERE,
                         tie_wins_later=False)
    tr = rect_t_matrix(scene.rects, ro, rd, t_min, INF)
    tt = TRIANGLE_KERNELS[triangle_algorithm](
        scene.triangles, ro, rd, t_min, INF)
    best_r = _class_best(tr, scene.rects.scan, scene.rects.sub,
                         CLASS_RECT, tie_wins_later=True)
    best_t = _class_best(tt, scene.triangles.scan, None, CLASS_TRI,
                         tie_wins_later=True)
    prim_best = _merge(_merge(best_s, best_r), best_t)
    class_mats = [(ts, scene.spheres.scan), (tr, scene.rects.scan),
                  (tt, scene.triangles.scan)]
    prim_prefix_arg = None


    rng_state, best = media_events(
        scene.media, ro, rd, rng_state, prim_best, class_mats, t_min,
        lane_mask, precomputed_prefix=prim_prefix_arg)

    return rng_state, build_hit(scene, best, ro, rd, rtime)
