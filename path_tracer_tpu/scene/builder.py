"""Host-side scene construction: the analogue of the reference's ``main()``
scene assembly (``/root/reference/src/main.cpp:61-161``) producing packed SoA
device arrays instead of a ``std::vector<std::variant>``.

The builder mirrors the reference's object model one-to-one:

=================  =============================================
reference          builder call
=================  =============================================
sphere             add_sphere / add_moving_sphere
xy/xz/yz_rect      add_xy_rect / add_xz_rect / add_yz_rect
triangle           add_triangle
box                add_box            (expands to 6 rects, box.hpp:20-25)
constant_medium    add_constant_medium
materials          lambertian / metal / dielectric / light / isotropic
textures           solid_texture / checker_texture / image_texture
=================  =============================================

Scan indices record each hittable's position in the insertion order so the
device kernels can reproduce the reference's linear-scan hit resolution
(render.hpp:37-49) and the medium's position-dependent RNG semantics.

Packing runs in NumPy at scene-build time (host side, once per scene); the
native C++ runtime under ``native/`` covers the image-output path
(tonemap + PNG encode), not scene packing.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from ..core.vec import Vec3
from . import types as T

Color = Tuple[float, float, float]


class TextureRef(int):
    """Opaque texture handle."""


class MaterialRef(int):
    """Opaque material handle."""


def _vec3_np(rows: Sequence[Sequence[float]]) -> Vec3:
    a = np.asarray(rows, np.float32).reshape(-1, 3)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


class SceneBuilder:
    def __init__(self):
        # textures
        self._tex_rows: List[Tuple[int, Color, Color, int, int, int, float]] = []
        # image atlas starts with the reference's fallback pixel bytes (0,0,1)
        # (texture.hpp:157) at pixel offset 0.
        self._atlas: List[np.ndarray] = [np.array([[0, 0, 1]], np.uint8)]
        self._atlas_pixels = 1
        # materials: (mtype, color, param, tex)
        self._mat_rows: List[Tuple[int, Color, float, int]] = []
        # primitives
        self._spheres: List[tuple] = []
        self._rects: List[tuple] = []
        self._tris: List[tuple] = []
        self._media: List[tuple] = []
        self._n_hittables = 0

    # ------------------------------------------------------------------
    # Textures
    # ------------------------------------------------------------------
    def solid_texture(self, c: Color) -> TextureRef:
        self._tex_rows.append((T.TEX_SOLID, tuple(c), (0, 0, 0), 1, 1, 0, 1.0))
        return TextureRef(len(self._tex_rows) - 1)

    def checker_texture(self, odd: Color, even: Color) -> TextureRef:
        """checker_texture(c1, c2): odd=c1, even=c2 (texture.hpp:36-41)."""
        self._tex_rows.append(
            (T.TEX_CHECKER, tuple(odd), tuple(even), 1, 1, 0, 1.0))
        return TextureRef(len(self._tex_rows) - 1)

    def image_texture(self, source: Union[str, np.ndarray],
                      cyclic_frequency: float = 1.0) -> TextureRef:
        """Load an RGB8 image into the shared atlas
        (texture.hpp:97-117).  ``source`` may be a path or an (H, W, 3)
        uint8 array.  On load failure: 1x1 texture at offset 0, i.e. the
        fallback (0,0,1)-bytes pixel (texture.hpp:106-111)."""
        data: Optional[np.ndarray] = None
        if isinstance(source, np.ndarray):
            data = np.ascontiguousarray(source, np.uint8).reshape(
                source.shape[0], source.shape[1], 3)
        else:
            try:
                from PIL import Image
                with Image.open(source) as im:
                    data = np.asarray(im.convert("RGB"), np.uint8)
            except Exception as e:  # missing file / no PIL / bad image
                import sys
                print(f"ERROR: Could not load texture image file '{source}'. "
                      f"{e}", file=sys.stderr)
                data = None
        if data is None:
            w = h = 1
            offset = 0
        else:
            h, w = data.shape[:2]
            offset = self._atlas_pixels
            self._atlas.append(data.reshape(-1, 3))
            self._atlas_pixels += w * h
        self._tex_rows.append(
            (T.TEX_IMAGE, (0, 0, 0), (0, 0, 0), w, h, offset,
             float(cyclic_frequency)))
        return TextureRef(len(self._tex_rows) - 1)

    def _as_texture(self, t: Union[TextureRef, Color]) -> TextureRef:
        if isinstance(t, TextureRef):
            return t
        return self.solid_texture(t)

    # ------------------------------------------------------------------
    # Materials
    # ------------------------------------------------------------------
    def lambertian(self, albedo: Union[TextureRef, Color]) -> MaterialRef:
        tex = self._as_texture(albedo)
        self._mat_rows.append((T.MAT_LAMBERTIAN, (0, 0, 0), 0.0, int(tex)))
        return MaterialRef(len(self._mat_rows) - 1)

    def metal(self, albedo: Color, fuzz: float) -> MaterialRef:
        fuzz = float(np.clip(fuzz, 0.0, 1.0))  # material.hpp:37
        self._mat_rows.append((T.MAT_METAL, tuple(albedo), fuzz, 0))
        return MaterialRef(len(self._mat_rows) - 1)

    def dielectric(self, ref_idx: float, albedo: Color) -> MaterialRef:
        self._mat_rows.append((T.MAT_DIELECTRIC, tuple(albedo),
                               float(ref_idx), 0))
        return MaterialRef(len(self._mat_rows) - 1)

    def light(self, emit: Union[TextureRef, Color]) -> MaterialRef:
        tex = self._as_texture(emit)
        self._mat_rows.append((T.MAT_LIGHT, (0, 0, 0), 0.0, int(tex)))
        return MaterialRef(len(self._mat_rows) - 1)

    def isotropic(self, albedo: Union[TextureRef, Color]) -> MaterialRef:
        tex = self._as_texture(albedo)
        self._mat_rows.append((T.MAT_ISOTROPIC, (0, 0, 0), 0.0, int(tex)))
        return MaterialRef(len(self._mat_rows) - 1)

    # ------------------------------------------------------------------
    # Primitives
    # ------------------------------------------------------------------
    def add_sphere(self, center, radius: float, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._spheres.append((center, center, float(radius), 0.0, 0.0,
                              int(mat), scan))

    def add_moving_sphere(self, c0, c1, time0: float, time1: float,
                          radius: float, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._spheres.append((c0, c1, float(radius), float(time0),
                              float(time1), int(mat), scan))

    def add_xy_rect(self, x0, x1, y0, y1, k, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._rects.append((T.RECT_XY, x0, x1, y0, y1, k, int(mat), scan, 0))

    def add_xz_rect(self, x0, x1, z0, z1, k, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._rects.append((T.RECT_XZ, x0, x1, z0, z1, k, int(mat), scan, 0))

    def add_yz_rect(self, y0, y1, z0, z1, k, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._rects.append((T.RECT_YZ, y0, y1, z0, z1, k, int(mat), scan, 0))

    def add_triangle(self, v0, v1, v2, mat: MaterialRef) -> None:
        scan = self._next_scan()
        self._tris.append((v0, v1, v2, int(mat), scan))

    def add_box(self, p0, p1, mat: MaterialRef) -> None:
        """Expand to 6 rect sides in the reference's side order
        (box.hpp:20-25): xy@z1, xy@z0, xz@y1, xz@y0, yz@x1, yz@x0."""
        scan = self._next_scan()
        for sub, row in enumerate(self._box_sides(p0, p1, int(mat))):
            self._rects.append(row[:7] + (scan, sub))

    @staticmethod
    def _box_sides(p0, p1, mat: int):
        x0, y0, z0 = p0
        x1, y1, z1 = p1
        return [
            (T.RECT_XY, x0, x1, y0, y1, z1, mat, None),
            (T.RECT_XY, x0, x1, y0, y1, z0, mat, None),
            (T.RECT_XZ, x0, x1, z0, z1, y1, mat, None),
            (T.RECT_XZ, x0, x1, z0, z1, y0, mat, None),
            (T.RECT_YZ, y0, y1, z0, z1, x1, mat, None),
            (T.RECT_YZ, y0, y1, z0, z1, x0, mat, None),
        ]

    def add_constant_medium(self, boundary, density: float,
                            albedo: Union[TextureRef, Color]) -> None:
        """boundary: ("sphere", center, radius) or ("box", p0, p1).
        Creates the isotropic phase-function material internally
        (constant_medium.hpp:18-27)."""
        mat = self.isotropic(albedo)
        scan = self._next_scan()
        kind = boundary[0]
        if kind == "sphere":
            _, c, r = boundary
            self._media.append((T.MED_BOUND_SPHERE, c, float(r),
                                (0, 0, 0), (0, 0, 0),
                                -1.0 / float(density), int(mat), scan))
        elif kind == "box":
            _, p0, p1 = boundary
            self._media.append((T.MED_BOUND_BOX, (0, 0, 0), 0.0, p0, p1,
                                -1.0 / float(density), int(mat), scan))
        else:
            raise ValueError(f"unknown boundary kind {kind!r}")

    def _next_scan(self) -> int:
        s = self._n_hittables
        self._n_hittables += 1
        return s

    # ------------------------------------------------------------------
    # Packing
    # ------------------------------------------------------------------
    def build(self, pad_multiple: int = 8) -> T.Scene:
        """Pack to SoA device arrays.  Every class is padded to at least one
        lane (all-False active) and up to a multiple of ``pad_multiple`` so
        downstream kernels see stable, tile-friendly shapes."""
        def padlen(n: int) -> int:
            n = max(n, 1)
            return -(-n // pad_multiple) * pad_multiple

        # spheres
        ns = len(self._spheres)
        ps = padlen(ns)
        c0 = np.zeros((ps, 3), np.float32)
        c1 = np.zeros((ps, 3), np.float32)
        rad = np.zeros(ps, np.float32)
        st0 = np.zeros(ps, np.float32)
        st1 = np.zeros(ps, np.float32)
        smat = np.zeros(ps, np.int32)
        sscan = np.full(ps, 2**30, np.int32)
        sact = np.zeros(ps, bool)
        for i, (a, b, r, t0, t1, m, sc) in enumerate(self._spheres):
            c0[i] = a
            c1[i] = b
            rad[i] = r
            st0[i] = t0
            st1[i] = t1
            smat[i] = m
            sscan[i] = sc
            sact[i] = True
        spheres = T.Spheres(
            c0=_vec3_np(c0), c1=_vec3_np(c1), radius=jnp.asarray(rad),
            time0=jnp.asarray(st0), time1=jnp.asarray(st1),
            mat=jnp.asarray(smat), scan=jnp.asarray(sscan),
            active=jnp.asarray(sact))

        # rects
        nr = len(self._rects)
        pr = padlen(nr)
        rax = np.zeros(pr, np.int32)
        ra0 = np.zeros(pr, np.float32)
        ra1 = np.ones(pr, np.float32)
        rb0 = np.zeros(pr, np.float32)
        rb1 = np.ones(pr, np.float32)
        rk = np.zeros(pr, np.float32)
        rmat = np.zeros(pr, np.int32)
        rscan = np.full(pr, 2**30, np.int32)
        rsub = np.zeros(pr, np.int32)
        ract = np.zeros(pr, bool)
        for i, (ax, a0, a1, b0, b1, k, m, sc, sub) in enumerate(self._rects):
            rax[i] = ax
            ra0[i] = a0
            ra1[i] = a1
            rb0[i] = b0
            rb1[i] = b1
            rk[i] = k
            rmat[i] = m
            rscan[i] = sc
            rsub[i] = sub
            ract[i] = True
        rects = T.Rects(
            axis=jnp.asarray(rax), a0=jnp.asarray(ra0), a1=jnp.asarray(ra1),
            b0=jnp.asarray(rb0), b1=jnp.asarray(rb1), k=jnp.asarray(rk),
            mat=jnp.asarray(rmat), scan=jnp.asarray(rscan),
            sub=jnp.asarray(rsub), active=jnp.asarray(ract))

        # triangles
        nt = len(self._tris)
        pt = padlen(nt)
        tv0 = np.zeros((pt, 3), np.float32)
        tv1 = np.zeros((pt, 3), np.float32)
        tv1[:, 0] = 1.0
        tv2 = np.zeros((pt, 3), np.float32)
        tv2[:, 1] = 1.0
        tmat = np.zeros(pt, np.int32)
        tscan = np.full(pt, 2**30, np.int32)
        tact = np.zeros(pt, bool)
        for i, (a, b, c, m, sc) in enumerate(self._tris):
            tv0[i] = a
            tv1[i] = b
            tv2[i] = c
            tmat[i] = m
            tscan[i] = sc
            tact[i] = True
        tris = T.Triangles(
            v0=_vec3_np(tv0), v1=_vec3_np(tv1), v2=_vec3_np(tv2),
            mat=jnp.asarray(tmat), scan=jnp.asarray(tscan),
            active=jnp.asarray(tact))

        # media (usually few; pad to >=1 only)
        nm = len(self._media)
        pm = max(nm, 1)
        mb = np.zeros(pm, np.int32)
        mc = np.zeros((pm, 3), np.float32)
        mr = np.ones(pm, np.float32)
        mp0 = np.zeros((pm, 3), np.float32)
        mp1 = np.ones((pm, 3), np.float32)
        mnid = np.full(pm, -1.0, np.float32)
        mmat = np.zeros(pm, np.int32)
        mscan = np.full(pm, 2**30, np.int32)
        mact = np.zeros(pm, bool)
        for i, (bt, c, r, p0, p1, nid, m, sc) in enumerate(self._media):
            mb[i] = bt
            mc[i] = c
            mr[i] = r
            mp0[i] = p0
            mp1[i] = p1
            mnid[i] = nid
            mmat[i] = m
            mscan[i] = sc
            mact[i] = True
        media = T.Media(
            btype=jnp.asarray(mb), c=_vec3_np(mc), r=jnp.asarray(mr),
            pmin=_vec3_np(mp0), pmax=_vec3_np(mp1),
            neg_inv_density=jnp.asarray(mnid), mat=jnp.asarray(mmat),
            scan=jnp.asarray(mscan), active=jnp.asarray(mact))

        # materials
        nmat = max(len(self._mat_rows), 1)
        mt = np.zeros(nmat, np.int32)
        mcol = np.zeros((nmat, 3), np.float32)
        mpar = np.ones(nmat, np.float32)
        mtex = np.zeros(nmat, np.int32)
        for i, (ty, col, par, tex) in enumerate(self._mat_rows):
            mt[i] = ty
            mcol[i] = col
            mpar[i] = par
            mtex[i] = tex
        materials = T.Materials(
            mtype=jnp.asarray(mt), color=_vec3_np(mcol),
            param=jnp.asarray(mpar), tex=jnp.asarray(mtex))

        # textures
        ntex = max(len(self._tex_rows), 1)
        tty = np.zeros(ntex, np.int32)
        tc1 = np.zeros((ntex, 3), np.float32)
        tc2 = np.zeros((ntex, 3), np.float32)
        tw = np.ones(ntex, np.int32)
        th = np.ones(ntex, np.int32)
        toff = np.zeros(ntex, np.int32)
        tfreq = np.ones(ntex, np.float32)
        for i, (ty, a, b, w, h, off, fr) in enumerate(self._tex_rows):
            tty[i] = ty
            tc1[i] = a
            tc2[i] = b
            tw[i] = w
            th[i] = h
            toff[i] = off
            tfreq[i] = fr
        atlas = np.concatenate(self._atlas, axis=0)
        textures = T.Textures(
            ttype=jnp.asarray(tty), c1=_vec3_np(tc1), c2=_vec3_np(tc2),
            width=jnp.asarray(tw), height=jnp.asarray(th),
            offset=jnp.asarray(toff), freq=jnp.asarray(tfreq),
            atlas=jnp.asarray(atlas))

        return T.Scene(
            spheres=spheres, rects=rects, triangles=tris, media=media,
            materials=materials, textures=textures,
            n_hittables=jnp.asarray(self._n_hittables, jnp.int32))
