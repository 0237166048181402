"""Branchless batched material scatter — all five reference materials
(``/root/reference/include/material.hpp``) evaluated lane-parallel and
selected by material id, replacing the per-ray ``dev_visit`` dispatch.

RNG-draw accounting (for stream parity with the reference): each lane draws
only what its own material would —

* lambertian: 3 (unit_vec, material.hpp:21)
* metal: 3 (in_unit_ball, material.hpp:43 — drawn even when fuzz == 0)
* dielectric: 1 iff refraction is possible (the C++ short-circuit in
  material.hpp:80-84 skips the Fresnel draw when cannot_refract)
* lightsource: 0 (material.hpp:104)
* isotropic: 3 (in_unit_ball, material.hpp:122)

Masked advancement with disjoint per-material masks reproduces this exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.vec import Vec3, dot, reflect, refract, unit_vector, where as vwhere
from ..scene import types as T
from ..scene.textures import texture_value
from .intersect import Hit, gather_rows


class Scatter(NamedTuple):
    direction: Vec3            # new ray direction (origin is hit.p)
    attenuation: Vec3          # multiplier applied to throughput
    emitted: Vec3              # only nonzero for lights
    did_scatter: jnp.ndarray   # bool — False terminates the path


def _pow5(x: jnp.ndarray) -> jnp.ndarray:
    """(1-cos)^5 as a multiply chain — used identically in the NumPy parity
    oracle so both implementations agree bitwise (sycl::pow differs by ulps
    anyway)."""
    x2 = x * x
    return x2 * x2 * x


def scatter(scene: T.Scene, hit: Hit, rd_in: Vec3,
            rng_state: jnp.ndarray, lane_mask: jnp.ndarray
            ) -> Tuple[jnp.ndarray, Scatter]:
    """lane_mask = alive & hit.hit; dead/miss lanes neither draw RNG nor
    produce meaningful outputs."""
    mats = scene.materials
    mtype, mcx, mcy, mcz, mparam, mtexf = gather_rows(
        hit.mat, mats.mtype, mats.color.x, mats.color.y, mats.color.z,
        mats.param, mats.tex)
    mcolor = Vec3(mcx, mcy, mcz)
    mtex = mtexf.astype(jnp.int32)

    is_lam = mtype == T.MAT_LAMBERTIAN
    is_metal = mtype == T.MAT_METAL
    is_diel = mtype == T.MAT_DIELECTRIC
    is_light = mtype == T.MAT_LIGHT
    is_iso = mtype == T.MAT_ISOTROPIC

    # One texture fetch serves lambertian/isotropic albedo and light emission.
    tex_val = texture_value(scene.textures, mtex, hit.u, hit.v, hit.p)

    n = hit.normal

    # --- lambertian (material.hpp:18-28): dir = normal + unit_vec ---
    rng_state, uvec = rng_mod.next_unit_vec(rng_state, lane_mask & is_lam)
    dir_lam = n + uvec

    # --- metal (material.hpp:39-48): reflect(unit(d_in), n) + fuzz*ball ---
    rng_state, ball_m = rng_mod.next_in_unit_ball(rng_state,
                                                  lane_mask & is_metal)
    ud = unit_vector(rd_in)
    reflected = reflect(ud, n)
    dir_metal = reflected + ball_m * mparam
    metal_alive = dot(dir_metal, n) > 0.0    # material.hpp:47

    # --- dielectric (material.hpp:68-89) ---
    # Non-dielectric lanes have param 0 (metal fuzz / unused): 1/0 = inf
    # would produce a NaN r0 = (1-inf)/(1+inf) that poisons gradients even
    # though the lane is masked — substitute a harmless IOR first.
    ior = jnp.where(is_diel, mparam, 1.5)
    refraction_ratio = jnp.where(hit.front_face, 1.0 / ior, ior)
    cos_theta = jnp.minimum(-dot(ud, n), 1.0)
    # grad-safe: at cos == 1 the plain sqrt backward is infinite.
    from ..core.vec import grad_safe_sqrt
    sin_theta = grad_safe_sqrt(1.0 - cos_theta * cos_theta)
    cannot_refract = refraction_ratio * sin_theta > 1.0
    r0 = (1.0 - refraction_ratio) / (1.0 + refraction_ratio)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * _pow5(1.0 - cos_theta)
    # C++ short-circuit: Fresnel draw only when refraction is possible.
    diel_draw = lane_mask & is_diel & ~cannot_refract
    rng_state, uni = rng_mod.next_f01(rng_state, diel_draw)
    choose_reflect = cannot_refract | (diel_draw & (reflectance > uni))
    dir_diel = vwhere(choose_reflect, reflect(ud, n),
                      refract(ud, n, refraction_ratio))

    # --- isotropic (material.hpp:118-127): dir = ball ---
    rng_state, ball_i = rng_mod.next_in_unit_ball(rng_state,
                                                  lane_mask & is_iso)
    dir_iso = ball_i

    # --- combine ---
    direction = Vec3(
        jnp.where(is_lam, dir_lam.x,
                  jnp.where(is_metal, dir_metal.x,
                            jnp.where(is_diel, dir_diel.x, dir_iso.x))),
        jnp.where(is_lam, dir_lam.y,
                  jnp.where(is_metal, dir_metal.y,
                            jnp.where(is_diel, dir_diel.y, dir_iso.y))),
        jnp.where(is_lam, dir_lam.z,
                  jnp.where(is_metal, dir_metal.z,
                            jnp.where(is_diel, dir_diel.z, dir_iso.z))),
    )

    tex_or_col = vwhere(is_metal | is_diel, mcolor, tex_val)
    one = jnp.ones_like(hit.t)
    attenuation = vwhere(is_light, Vec3(one, one, one), tex_or_col)

    zero = jnp.zeros_like(hit.t)
    emitted = vwhere(is_light, tex_val, Vec3(zero, zero, zero))

    did_scatter = jnp.where(
        is_light, False, jnp.where(is_metal, metal_alive, True)) & lane_mask

    return rng_state, Scatter(direction=direction, attenuation=attenuation,
                              emitted=emitted, did_scatter=did_scatter)
