"""Scalar NumPy oracle: an independent, straightforward implementation of the
reference renderer's semantics (per-pixel sequential loops, float32
throughout), used as ground truth for the vectorized JAX engine.

It consumes the *packed* Scene arrays (so both implementations see identical
scene data) and reconstructs the reference's scan-ordered hittable list from
the (scan, sub) metadata.  RNG is the same xorshift32 + LocalPseudoRNG
transforms (rtweekend.hpp:33-92); float arithmetic uses np.float32 with the
same association order as the JAX code, so configurations that avoid
transcendental-heavy paths match bit-for-bit and the rest match to float
tolerance.

All semantics cite /root/reference/include/* (see docstrings inline).
"""
from __future__ import annotations

import numpy as np

F = np.float32
PI = F(3.1415926535897932385)
INF = F(np.inf)


def v3(x, y, z):
    return np.array([x, y, z], np.float32)


def dot(a, b):
    return F(a[0] * b[0] + (a[1] * b[1] + a[2] * b[2]))


def cross(a, b):
    return v3(a[1] * b[2] - a[2] * b[1],
              a[2] * b[0] - a[0] * b[2],
              a[0] * b[1] - a[1] * b[0])


def length(a):
    return F(np.sqrt(dot(a, a)))


def unit(a):
    return a / length(a)


def reflect(v, n):
    return v - n * F(2.0 * dot(v, n))


def refract(uv, n, etai_over_etat):
    cos_theta = F(min(-dot(uv, n), F(1.0)))
    r_out_perp = (uv + n * cos_theta) * F(etai_over_etat)
    r_out_parallel = n * F(-np.sqrt(np.abs(F(1.0) - dot(r_out_perp,
                                                        r_out_perp))))
    return r_out_perp + r_out_parallel


def pow5(x):
    x = F(x)
    x2 = F(x * x)
    return F(F(x2 * x2) * x)


class Rng:
    """xorshift32 + LocalPseudoRNG transforms."""

    MASK = 0xFFFFFFFF

    def __init__(self, state):
        self.s = int(state) & self.MASK

    def _next(self):
        s = self.s
        s ^= s >> 7
        s = (s ^ ((s << 1) & self.MASK)) & self.MASK
        s ^= s >> 9
        self.s = s
        return s

    def f01(self):
        return F(F(self._next()) * F(1.0 / (1 << 32)))

    def frange(self, lo, hi):
        return F(F(lo) + F(F(hi) - F(lo)) * self.f01())

    def unit_vec(self):
        x = self.frange(-1.0, 1.0)
        maxy = F(np.sqrt(F(1.0) - x * x))
        y = self.frange(-maxy, maxy)
        absz = F(np.sqrt(F(maxy * maxy - y * y)))
        u = self.f01()
        z = absz if u > 0.5 else F(-absz)
        return v3(x, y, z)

    def in_unit_ball(self):
        r = self.f01()
        theta = self.frange(0.0, 2.0 * float(PI))
        phi = self.frange(0.0, float(PI))
        ps = F(r * np.sin(phi))
        z = F(r * np.cos(phi))
        return v3(F(ps * np.cos(theta)), F(ps * np.sin(theta)), z)

    def in_unit_disk(self):
        x = self.frange(-1.0, 1.0)
        maxy = F(np.sqrt(F(1.0) - x * x))
        y = self.frange(-maxy, maxy)
        return v3(x, y, F(0.0))


# ---------------------------------------------------------------------------
# Scene reconstruction from packed arrays
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x)


def scan_list(scene):
    """Rebuild the reference's scan-ordered entries from (scan, sub)."""
    entries = []
    sp = scene.spheres
    for i in range(len(_np(sp.radius))):
        if _np(sp.active)[i]:
            entries.append((int(_np(sp.scan)[i]), 0, "sphere", i))
    rc = scene.rects
    for i in range(len(_np(rc.k))):
        if _np(rc.active)[i]:
            entries.append((int(_np(rc.scan)[i]), int(_np(rc.sub)[i]),
                            "rect", i))
    tr = scene.triangles
    for i in range(len(_np(tr.mat))):
        if _np(tr.active)[i]:
            entries.append((int(_np(tr.scan)[i]), 0, "tri", i))
    md = scene.media
    for i in range(len(_np(md.mat))):
        if _np(md.active)[i]:
            entries.append((int(_np(md.scan)[i]), 0, "medium", i))
    entries.sort()
    return entries


class HitRec:
    __slots__ = ("t", "p", "normal", "front_face", "u", "v")

    def __init__(self):
        self.t = F(0)
        self.p = v3(0, 0, 0)
        self.normal = v3(0, 0, 0)
        self.front_face = True
        self.u = F(0)
        self.v = F(0)

    def set_face_normal(self, rdir, outward):
        self.front_face = dot(rdir, outward) < 0
        self.normal = outward if self.front_face else -outward


def sphere_center(sp, i, time):
    c0 = v3(_np(sp.c0.x)[i], _np(sp.c0.y)[i], _np(sp.c0.z)[i])
    c1 = v3(_np(sp.c1.x)[i], _np(sp.c1.y)[i], _np(sp.c1.z)[i])
    t0 = F(_np(sp.time0)[i])
    t1 = F(_np(sp.time1)[i])
    if t0 == t1:
        return c0
    return c0 + (c1 - c0) * F((F(time) - t0) / (t1 - t0))


def hit_sphere(sp, i, ro, rd, rtime, tmin, tmax, rec):
    """sphere.hpp:59-106."""
    c = sphere_center(sp, i, rtime)
    radius = F(_np(sp.radius)[i])
    oc = ro - c
    a = dot(rd, rd)
    b = dot(oc, rd)
    cc = F(dot(oc, oc) - radius * radius)
    disc = F(b * b - a * cc)
    if disc > 0:
        sq = F(np.sqrt(disc))
        for temp in (F((-b - sq) / a), F((-b + sq) / a)):
            if temp < tmax and temp > tmin:
                rec.t = temp
                rec.p = ro + rd * temp
                outward = (rec.p - c) / radius
                rec.set_face_normal(rd, outward)
                n = rec.normal
                phi = F(np.arctan2(n[2], n[0]))
                theta = F(np.arcsin(np.clip(n[1], -1.0, 1.0)))
                rec.u = F(1.0 - (phi + PI) / (2 * PI))
                rec.v = F((theta + PI / 2) / PI)
                return True
    return False


_RECT_COMP = {0: (2, 0, 1), 1: (1, 0, 2), 2: (0, 1, 2)}  # axis -> (k, a, b)


def hit_rect(rc, i, ro, rd, tmin, tmax, rec):
    """rectangle.hpp:31-49 (+xz/yz siblings), reject-form conditions."""
    kc, ac, bc = _RECT_COMP[int(_np(rc.axis)[i])]
    k = F(_np(rc.k)[i])
    dk = F(rd[kc])
    with np.errstate(divide="ignore", invalid="ignore"):
        t = F((k - ro[kc]) / dk)
    if t < tmin or t > tmax or not np.isfinite(t):
        return False
    av = F(ro[ac] + t * rd[ac])
    bv = F(ro[bc] + t * rd[bc])
    a0, a1 = F(_np(rc.a0)[i]), F(_np(rc.a1)[i])
    b0, b1 = F(_np(rc.b0)[i]), F(_np(rc.b1)[i])
    if av < a0 or av > a1 or bv < b0 or bv > b1:
        return False
    rec.u = F((av - a0) / (a1 - a0))
    rec.v = F((bv - b0) / (b1 - b0))
    rec.t = t
    rec.p = ro + rd * t
    outward = v3(0, 0, 0)
    outward[kc] = 1.0
    rec.set_face_normal(rd, outward)
    return True


def hit_tri(tr, i, ro, rd, tmin, tmax, rec):
    """triangle.hpp:58-100 Möller–Trumbore, eps 1e-7."""
    p0 = v3(_np(tr.v0.x)[i], _np(tr.v0.y)[i], _np(tr.v0.z)[i])
    p1 = v3(_np(tr.v1.x)[i], _np(tr.v1.y)[i], _np(tr.v1.z)[i])
    p2 = v3(_np(tr.v2.x)[i], _np(tr.v2.y)[i], _np(tr.v2.z)[i])
    e1 = p1 - p0
    e2 = p2 - p0
    h = cross(rd, e2)
    a = dot(e1, h)
    a_abs = F(abs(a))
    if a_abs < F(1e-7):
        return False
    a_pos = a > 0
    s = ro - p0
    u = dot(s, h)
    if ((u > 0) != a_pos) or abs(u) > a_abs:
        return False
    q = cross(s, e1)
    v = dot(rd, q)
    if ((v > 0) != a_pos) or abs(F(u + v)) > a_abs:
        return False
    t = F(dot(e2, q) / a)
    if t < tmin or t > tmax:
        return False
    rec.set_face_normal(rd, cross(e1, e2))
    rec.t = t
    rec.p = ro + rd * t
    return True


def _hit_medium_boundary(scene, i, ro, rd, tmin, tmax, rec):
    """The boundary closest-hit used by constant_medium (sphere or box)."""
    md = scene.media
    if int(_np(md.btype)[i]) == 0:
        # boundary sphere: build a fake single-entry sphere view
        class _S:  # noqa: N801 - tiny adapter
            c0 = md.c
            c1 = md.c
            radius = md.r
            time0 = np.zeros_like(_np(md.r))
            time1 = np.zeros_like(_np(md.r))
        return hit_sphere(_S, i, ro, rd, F(0.0), tmin, tmax, rec)
    # box boundary: closest-hit over 6 sides in reference side order
    pmin = v3(_np(md.pmin.x)[i], _np(md.pmin.y)[i], _np(md.pmin.z)[i])
    pmax = v3(_np(md.pmax.x)[i], _np(md.pmax.y)[i], _np(md.pmax.z)[i])
    sides = [
        (0, pmin[0], pmax[0], pmin[1], pmax[1], pmax[2]),
        (0, pmin[0], pmax[0], pmin[1], pmax[1], pmin[2]),
        (1, pmin[0], pmax[0], pmin[2], pmax[2], pmax[1]),
        (1, pmin[0], pmax[0], pmin[2], pmax[2], pmin[1]),
        (2, pmin[1], pmax[1], pmin[2], pmax[2], pmax[0]),
        (2, pmin[1], pmax[1], pmin[2], pmax[2], pmin[0]),
    ]
    hit_any = False
    closest = tmax
    tmp = HitRec()
    for axis, a0, a1, b0, b1, k in sides:
        class _R:  # noqa: N801
            pass
        _R.axis = np.array([axis])
        _R.a0 = np.array([a0])
        _R.a1 = np.array([a1])
        _R.b0 = np.array([b0])
        _R.b1 = np.array([b1])
        _R.k = np.array([k])
        if hit_rect(_R, 0, ro, rd, tmin, closest, tmp):
            hit_any = True
            closest = tmp.t
            rec.t, rec.p = tmp.t, tmp.p
            rec.normal, rec.front_face = tmp.normal, tmp.front_face
            rec.u, rec.v = tmp.u, tmp.v
    return hit_any


def hit_medium(scene, i, ro, rd, rng, tmin, tmax, rec):
    """constant_medium.hpp:28-77, incl. the conditional RNG draw."""
    rec1, rec2 = HitRec(), HitRec()
    if not _hit_medium_boundary(scene, i, ro, rd, F(-np.inf), INF, rec1):
        return False
    if not _hit_medium_boundary(scene, i, ro, rd, F(rec1.t + F(1e-4)), INF,
                                rec2):
        return False
    t1, t2 = rec1.t, rec2.t
    if t1 < tmin:
        t1 = F(tmin)
    if t2 > tmax:
        t2 = F(tmax)
    if t1 >= t2:
        return False
    if t1 < 0:
        t1 = F(0)
    ray_length = length(rd)
    distance_inside = F((t2 - t1) * ray_length)
    with np.errstate(divide="ignore"):
        hit_distance = F(F(_np(scene.media.neg_inv_density)[i])
                         * F(np.log(rng.f01())))
    if hit_distance > distance_inside:
        return False
    rec.t = F(t1 + hit_distance / ray_length)
    rec.p = ro + rd * rec.t
    rec.normal = v3(1, 0, 0)
    rec.front_face = True
    return True


# ---------------------------------------------------------------------------
# Textures / materials
# ---------------------------------------------------------------------------

def texture_value(scene, tid, rec):
    tx = scene.textures
    tt = int(_np(tx.ttype)[tid])
    if tt == 0:  # solid
        return v3(_np(tx.c1.x)[tid], _np(tx.c1.y)[tid], _np(tx.c1.z)[tid])
    if tt == 1:  # checker, texture.hpp:42-49
        p = rec.p
        sines = F(F(np.sin(F(10.0) * p[0])) * F(np.sin(F(10.0) * p[1]))
                  * F(np.sin(F(10.0) * p[2])))
        if sines < 0:
            return v3(_np(tx.c1.x)[tid], _np(tx.c1.y)[tid], _np(tx.c1.z)[tid])
        return v3(_np(tx.c2.x)[tid], _np(tx.c2.y)[tid], _np(tx.c2.z)[tid])
    # image, texture.hpp:135-151
    w = int(_np(tx.width)[tid])
    h = int(_np(tx.height)[tid])
    off = int(_np(tx.offset)[tid])
    freq = F(_np(tx.freq)[tid])
    i = int(np.clip(F(np.fmod(rec.u * freq, F(1.0))) * (w - 1), 0, w - 1))
    j = int(np.clip(F((F(1.0) - F(np.fmod(rec.v * freq, F(1.0)))) * (h - 1)),
                    0, h - 1))
    pix = off + j * w + i
    atlas = _np(scene.textures.atlas)
    pix = min(pix, atlas.shape[0] - 1)
    texel = atlas[pix].astype(np.float32)
    s = F(1.0 / 255.0)
    return v3(texel[0] * s, texel[1] * s, texel[2] * s)


def scatter(scene, mat_id, rec, rd_in, rng):
    """material.hpp dispatch.  Returns (did_scatter, attenuation_mult,
    emitted, new_direction)."""
    m = scene.materials
    mtype = int(_np(m.mtype)[mat_id])
    zero = v3(0, 0, 0)
    if mtype == 0:  # lambertian, material.hpp:18-28
        d = rec.normal + rng.unit_vec()
        att = texture_value(scene, int(_np(m.tex)[mat_id]), rec)
        return True, att, zero, d
    if mtype == 1:  # metal, material.hpp:39-48
        fuzz = F(_np(m.param)[mat_id])
        ball = rng.in_unit_ball()
        d = reflect(unit(rd_in), rec.normal) + ball * fuzz
        att = v3(_np(m.color.x)[mat_id], _np(m.color.y)[mat_id],
                 _np(m.color.z)[mat_id])
        return bool(dot(d, rec.normal) > 0), att, zero, d
    if mtype == 2:  # dielectric, material.hpp:68-89
        ri = F(_np(m.param)[mat_id])
        att = v3(_np(m.color.x)[mat_id], _np(m.color.y)[mat_id],
                 _np(m.color.z)[mat_id])
        ratio = F(1.0 / ri) if rec.front_face else ri
        ud = unit(rd_in)
        cos_theta = F(min(-dot(ud, rec.normal), F(1.0)))
        sin_theta = F(np.sqrt(F(1.0) - cos_theta * cos_theta))
        cannot = F(ratio * sin_theta) > 1.0
        r0 = F((1 - ratio) / (1 + ratio))
        r0 = F(r0 * r0)
        refl = F(r0 + (1 - r0) * pow5(F(1.0) - cos_theta))
        if cannot or refl > rng.f01():   # short-circuit preserves draw count
            d = reflect(ud, rec.normal)
        else:
            d = refract(ud, rec.normal, ratio)
        return True, att, zero, d
    if mtype == 3:  # lightsource, material.hpp:100-109
        emitted = texture_value(scene, int(_np(m.tex)[mat_id]), rec)
        return False, v3(1, 1, 1), emitted, zero
    # isotropic, material.hpp:118-127
    d = rng.in_unit_ball()
    att = texture_value(scene, int(_np(m.tex)[mat_id]), rec)
    return True, att, zero, d


# ---------------------------------------------------------------------------
# Integration (render_pixel, render.hpp:25-106)
# ---------------------------------------------------------------------------

def hit_world(scene, entries, ro, rd, rtime, rng, rec):
    hit_anything = False
    closest = INF
    mat_id = 0
    tmp = HitRec()
    for scan, sub, kind, i in entries:
        ok = False
        if kind == "sphere":
            ok = hit_sphere(scene.spheres, i, ro, rd, rtime, F(0.001),
                            closest, tmp)
            m = int(_np(scene.spheres.mat)[i])
        elif kind == "rect":
            ok = hit_rect(scene.rects, i, ro, rd, F(0.001), closest, tmp)
            m = int(_np(scene.rects.mat)[i])
        elif kind == "tri":
            ok = hit_tri(scene.triangles, i, ro, rd, F(0.001), closest, tmp)
            m = int(_np(scene.triangles.mat)[i])
        else:
            ok = hit_medium(scene, i, ro, rd, rng, F(0.001), closest, tmp)
            m = int(_np(scene.media.mat)[i])
        if ok:
            hit_anything = True
            closest = tmp.t
            rec.t, rec.p = tmp.t, tmp.p.copy()
            rec.normal, rec.front_face = tmp.normal.copy(), tmp.front_face
            rec.u, rec.v = tmp.u, tmp.v
            mat_id = m
    return hit_anything, mat_id


def get_color(scene, entries, ro, rd, rtime, rng, depth,
              attenuate_emission=False):
    cur_o, cur_d = ro, rd
    cur_att = v3(1, 1, 1)
    for _ in range(depth):
        rec = HitRec()
        hit, mat_id = hit_world(scene, entries, cur_o, cur_d, rtime, rng, rec)
        if hit:
            did, att, emitted, nd = scatter(scene, mat_id, rec, cur_d, rng)
            if did:
                cur_att = cur_att * att
                cur_o, cur_d = rec.p, nd
            else:
                # render.hpp:73 — emitted returned UNattenuated (quirk)
                return cur_att * emitted if attenuate_emission else emitted
        else:
            ud = unit(cur_d)
            hp = F(0.5 * (ud[1] + 1.0))
            c = v3(1, 1, 1) * F(1.0 - hp) + v3(0.5, 0.7, 1.0) * hp
            return cur_att * c
    return v3(0, 0, 0)


def render(scene, cam, width, height, spp, depth, attenuate_emission=False):
    """Full-frame scalar render with parity seeding (render.hpp:126-136).
    Returns (H, W, 3) float32, y-up like the reference fb."""
    entries = scan_list(scene)
    cam_np = _camera_np(cam)
    img = np.zeros((height, width, 3), np.float32)
    for y in range(height):
        for x in range(width):
            rng = Rng(y * width + x)
            acc = v3(0, 0, 0)
            for _ in range(spp):
                u = F(F(F(x) + rng.f01()) / F(width))
                v = F(F(F(y) + rng.f01()) / F(height))
                ro, rd, tm = _get_ray(cam_np, u, v, rng)
                acc = acc + get_color(scene, entries, ro, rd, tm, rng, depth,
                                      attenuate_emission)
            img[y, x] = acc / F(spp)
    return img


def _camera_np(cam):
    g = lambda v: v3(float(v.x), float(v.y), float(v.z))
    return {
        "origin": g(cam.origin),
        "llc": g(cam.lower_left_corner),
        "horizontal": g(cam.horizontal),
        "vertical": g(cam.vertical),
        "u": g(cam.u),
        "v": g(cam.v),
        "lens_radius": F(cam.lens_radius),
        "time0": F(cam.time0),
        "time1": F(cam.time1),
    }


def _get_ray(c, s, t, rng):
    """camera.hpp:93-100."""
    rd = rng.in_unit_disk() * c["lens_radius"]
    offset = c["u"] * rd[0] + c["v"] * rd[1]
    origin = c["origin"] + offset
    direction = (c["llc"] + c["horizontal"] * s + c["vertical"] * t
                 - c["origin"] - offset)
    tm = rng.frange(c["time0"], c["time1"])
    return origin, direction, tm
