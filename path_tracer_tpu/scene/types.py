"""SoA scene arrays — the TPU-native replacement for the reference's
``std::variant`` heterogeneous scene vector.

The reference stores the scene as ``std::vector<hittable_t>`` with
``hittable_t = std::variant<sphere, xy_rect, triangle, box, constant_medium>``
(``/root/reference/include/render.hpp:22-23``) and dispatches per ray per
primitive with a device-safe visit.  On TPU that per-ray branching is exactly
wrong; instead each primitive *class* gets packed component arrays so a ray
batch intersects a whole class with branchless vectorized math (and the
ray-table dot products become MXU matmuls).

Boxes are decomposed into their 6 axis rectangles at build time — the
reference does literally the same thing at *construction* time
(``box.hpp:20-25``) and its box::hit is a closest-hit loop over the sides, so
flattening into the rect class is semantics-preserving given scan-order
metadata (below).

Scan-order metadata: the reference resolves hits by a linear scan that keeps
the closest-so-far, where a *later* primitive must be strictly closer to win
(``render.hpp:37-49``), and the smoke medium's stochastic hit draws RNG and
clamps its interval against the closest-so-far *at its scan position*
(``constant_medium.hpp:52-59``).  Every packed primitive therefore carries its
``scan`` index (position in the reference's scene vector) and a ``sub`` index
(box side order), so the vectorized argmin can reproduce tie-breaking and the
medium's prefix-min exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Vec3

# Material type ids (material.hpp:133-135 variant order).
MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_LIGHT = 3
MAT_ISOTROPIC = 4

# Texture type ids (texture.hpp:154 variant holds checker/solid/image).
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2

# Rect axis ids: which axis the plane constant k applies to.
RECT_XY = 0  # k on z, normal (0,0,1)  — rectangle.hpp:16-52
RECT_XZ = 1  # k on y, normal (0,1,0)  — rectangle.hpp:54-90
RECT_YZ = 2  # k on x, normal (1,0,0)  — rectangle.hpp:92-128

# Medium boundary types (constant_medium.hpp:10).
MED_BOUND_SPHERE = 0
MED_BOUND_BOX = 1


class Spheres(NamedTuple):
    """Static + moving spheres (sphere.hpp:26-117). Center at ray-time t is
    c0 + ((t - time0)/(time1 - time0)) * (c1 - c0); static iff time0==time1."""
    c0: Vec3          # (P,) each
    c1: Vec3
    radius: jnp.ndarray
    time0: jnp.ndarray
    time1: jnp.ndarray
    mat: jnp.ndarray      # int32 material id
    scan: jnp.ndarray     # int32 position in reference scene vector
    active: jnp.ndarray   # bool — False for padding lanes


class Rects(NamedTuple):
    """Axis-aligned rectangles of all three orientations, plus box sides.
    (a, b) are the two in-plane axes in reference order (xy: a=x b=y;
    xz: a=x b=z; yz: a=y b=z)."""
    axis: jnp.ndarray     # int32 RECT_*
    a0: jnp.ndarray
    a1: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    k: jnp.ndarray
    mat: jnp.ndarray
    scan: jnp.ndarray
    sub: jnp.ndarray      # int32 box-side order (0..5), 0 for standalone
    active: jnp.ndarray


class Triangles(NamedTuple):
    """Triangles intersected Möller–Trumbore style (triangle.hpp:58-100)."""
    v0: Vec3
    v1: Vec3
    v2: Vec3
    mat: jnp.ndarray
    scan: jnp.ndarray
    active: jnp.ndarray


class Media(NamedTuple):
    """Constant-density participating media (constant_medium.hpp:16-83).
    Boundary is a sphere or a box; the phase function is an isotropic
    material referenced by ``mat``."""
    btype: jnp.ndarray        # int32 MED_BOUND_*
    c: Vec3                   # sphere boundary center
    r: jnp.ndarray            # sphere boundary radius
    pmin: Vec3                # box boundary corners
    pmax: Vec3
    neg_inv_density: jnp.ndarray
    mat: jnp.ndarray
    scan: jnp.ndarray
    active: jnp.ndarray


class Materials(NamedTuple):
    """Unified material table (material.hpp variant flattened).
    color: metal albedo / dielectric tint.  param: metal fuzz (clamped [0,1]
    at build) / dielectric refractive index.  tex: texture id for
    lambertian albedo, light emission, isotropic albedo."""
    mtype: jnp.ndarray
    color: Vec3
    param: jnp.ndarray
    tex: jnp.ndarray


class Textures(NamedTuple):
    """Texture table + image atlas.  The atlas reproduces the reference's
    single serialized texture vector whose pixel 0 is the byte triple (0,0,1)
    load-failure fallback (texture.hpp:67-131, 157); offsets are in pixels."""
    ttype: jnp.ndarray
    c1: Vec3              # solid color / checker odd
    c2: Vec3              # checker even
    width: jnp.ndarray    # int32
    height: jnp.ndarray
    offset: jnp.ndarray
    freq: jnp.ndarray     # f32 cyclic frequency
    atlas: jnp.ndarray    # (Npix, 3) uint8


class Scene(NamedTuple):
    spheres: Spheres
    rects: Rects
    triangles: Triangles
    media: Media
    materials: Materials
    textures: Textures
    n_hittables: jnp.ndarray  # int32 scalar — length of the reference vector
