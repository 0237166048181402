"""Silhouette-aware gradients: edge sampling for sphere boundaries.

The detached-sampling estimator used by the differentiable integrator
(diff/params.py) captures only INTERIOR terms — shading changes at fixed
visibility.  Geometric parameters (sphere radius/center, camera) also move
the *silhouette*: the visibility indicator is a step function of the
parameter, its derivative a Dirac measure on the silhouette curve, which
pixel-interior Monte Carlo samples hit with probability zero.  Finite
differences DO capture it (rays flip sides), which is why the plain
estimator cannot match FD for radius/center (round-2 verdict item; the
discontinuity lives at the hit-test boundary, sphere.hpp:59-106).

This module implements the classical edge-sampling correction
(Li et al. 2018-style, rebuilt for the batched JAX renderer) for the
dominant boundary: the **primary-visibility silhouette of a sphere** seen
through a pinhole camera.

Derivation.  Write the image-space loss as an integral over the continuous
film plane (s, t) ∈ [0,1]² (the camera's get_ray coordinates,
camera.hpp:93-100; a box pixel filter makes the pixel mean exactly the
integral over the pixel's (s,t) cell times W·H):

    L(θ) = ∫∫ g(s,t) · f(s,t; θ) ds dt,

with f the path-traced radiance of the ray through (s,t) and g the
cotangent of the loss w.r.t. the image (for the mean-of-image loss,
g = 1/3 per channel; in general g(s,t) = ∂L/∂I_{p(s,t)} · W·H).

A sphere (c, R) is hit by the ray through (s,t) iff the quadratic
discriminant is positive (sphere.hpp:59-66):

    G(s,t;θ) = (oc·d)² − |d|² (|oc|² − R²) > 0 ,   oc = o − c,

with d(s,t) the (unnormalized) pinhole ray direction.  f is discontinuous
across the curve {G = 0}.  By the Reynolds transport theorem,

    dL/dθ = ∫∫ g ∂f/∂θ ds dt                    (interior; existing VJP)
          + ∮_{G=0} g(x) (f_in(x) − f_out(x)) · v_⊥(x;θ) dl(x),

where the line integral runs over the silhouette in (s,t) space,
f_in / f_out are the radiances immediately inside/outside, and the outward
normal velocity of the curve is

    v_⊥ = (∂G/∂θ) / |∇_{s,t} G| ,

from differentiating G(x(θ), θ) = 0 along the outward direction
−∇G/|∇G| (G decreases outward).

Sampling.  The 3-D silhouette of a sphere from a point o is an exact
circle: with m = (c−o)/L, L = |c−o|, it has center c − (R²/L) m and radius
R·sqrt(1 − R²/L²).  We sample K angles, project each point through the
camera onto the film plane (3×3 solve against the [horizontal, vertical,
−dir] basis), take the line element |dx/dφ| by forward-mode autodiff of the
projection, offset ±ε along the curve normal ∇G/|∇G| (∇G points inside),
and estimate f_in/f_out with the ordinary batched path tracer
(engine.integrator.trace).  Because both sides are FULL radiance estimates,
locally occluded stretches of the silhouette contribute ≈ 0 automatically
(f_in ≈ f_out there), matching the true transport derivative.

Scope (documented estimator contract):
* primary-visibility silhouettes of spheres through a pinhole camera
  (lens_radius must be ~0; a real aperture blurs the edge into a smooth
  penumbra that the interior estimator already differentiates);
* static spheres, or moving spheres at a fixed evaluation time
  (motion blur likewise smooths the edge over the shutter);
* secondary discontinuities (shadow edges, silhouettes seen via
  reflection/refraction) are out of scope — they need path-space edge
  sampling.
Supported parameters: sphere center (3), radius, and any camera parameter
(the same G carries the camera dependence).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..core.vec import Vec3
from ..engine.integrator import trace
from ..scene import types as T


class EdgeGrad(NamedTuple):
    """Boundary (silhouette) contribution to dL/dθ for one sphere."""
    center: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # d/dcx, d/dcy, d/dcz
    radius: jnp.ndarray


def _cam_vectors(cam: Camera):
    o = jnp.stack([cam.origin.x, cam.origin.y, cam.origin.z])
    llc = jnp.stack([cam.lower_left_corner.x, cam.lower_left_corner.y,
                     cam.lower_left_corner.z])
    Hv = jnp.stack([cam.horizontal.x, cam.horizontal.y, cam.horizontal.z])
    Vv = jnp.stack([cam.vertical.x, cam.vertical.y, cam.vertical.z])
    return o, llc, Hv, Vv


def _disc(s, t, c, R, o, llc, Hv, Vv):
    """G(s,t) — the sphere-hit discriminant of the pinhole ray through
    (s,t) (sphere.hpp:60-66 with the camera.hpp:96-98 direction)."""
    d = llc + s * Hv + t * Vv - o
    oc = o - c
    b = jnp.dot(oc, d)
    a = jnp.dot(d, d)
    cc = jnp.dot(oc, oc) - R * R
    return b * b - a * cc


def _silhouette_points(o, c, R, K):
    """K points on the 3-D silhouette circle of sphere (c,R) from origin o,
    as a function of angle phi — returns the map phi -> point for autodiff."""
    m = c - o
    L = jnp.sqrt(jnp.dot(m, m))
    mh = m / L
    # tangent circle: center q, radius rho (elementary cone geometry)
    q = c - (R * R / L) * mh
    rho = R * jnp.sqrt(jnp.maximum(1.0 - (R / L) ** 2, 0.0))
    # orthonormal basis perpendicular to mh
    ref = jnp.where(jnp.abs(mh[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], mh.dtype),
                    jnp.array([0.0, 1.0, 0.0], mh.dtype))
    e1 = jnp.cross(mh, ref)
    e1 = e1 / jnp.sqrt(jnp.dot(e1, e1))
    e2 = jnp.cross(mh, e1)

    def point(phi):
        return q + rho * (jnp.cos(phi) * e1 + jnp.sin(phi) * e2)

    phis = (jnp.arange(K, dtype=jnp.float32) + 0.5) * (2.0 * jnp.pi / K)
    return point, phis


def _project(p, o, llc, Hv, Vv):
    """Film-plane coordinates (s,t) of world point p through the pinhole:
    solve o + lam*(p-o) = llc + s*H + t*V  (3 eqs, 3 unknowns)."""
    A = jnp.stack([Hv, Vv, -(p - o)], axis=1)   # (3,3) columns
    rhs = o - llc
    sol = jnp.linalg.solve(A, rhs)
    return sol[0], sol[1]


def sphere_silhouette_grad(scene: T.Scene, cam: Camera, width: int,
                           height: int, sphere_idx: int,
                           image_cotangent: jnp.ndarray, *,
                           n_edge: int = 256, spp_edge: int = 32,
                           max_depth: int = 8, eps_px: float = 0.5,
                           attenuate_emission: bool = False,
                           t_min: float = 1e-3, seed: int = 7,
                           time: float = 0.0) -> EdgeGrad:
    """Boundary term of dL/d(center, radius) for ``scene.spheres[sphere_idx]``.

    image_cotangent: (height, width, 3) array ∂L/∂I (e.g. full of
    1/(W*H*3) for the mean-of-image loss).  Row 0 = image bottom, the
    renderer's fb convention.

    Returns the silhouette contribution ONLY; add it to the interior
    gradient from the differentiable renderer to compare against finite
    differences."""
    f32 = jnp.float32
    o, llc, Hv, Vv = _cam_vectors(cam)
    sph = scene.spheres
    c = jnp.stack([sph.c0.x[sphere_idx], sph.c0.y[sphere_idx],
                   sph.c0.z[sphere_idx]])
    R = sph.radius[sphere_idx]

    point_fn, phis = _silhouette_points(o, c, R, n_edge)

    def st_of_phi(phi):
        return jnp.stack(_project(point_fn(phi), o, llc, Hv, Vv))

    st = jax.vmap(st_of_phi)(phis)                       # (K, 2)
    dst_dphi = jax.vmap(jax.jacfwd(st_of_phi))(phis)     # (K, 2)
    line_el = jnp.sqrt(jnp.sum(dst_dphi ** 2, axis=1))   # |x'(phi)|

    # gradients of G at the edge points: wrt (s, t) and wrt (c, R)
    def G_all(s, t, cx, cy, cz, r):
        return _disc(s, t, jnp.stack([cx, cy, cz]), r, o, llc, Hv, Vv)

    grads = jax.vmap(jax.grad(G_all, argnums=(0, 1, 2, 3, 4, 5)))(
        st[:, 0], st[:, 1], jnp.full((n_edge,), c[0]),
        jnp.full((n_edge,), c[1]), jnp.full((n_edge,), c[2]),
        jnp.full((n_edge,), R))
    gs, gt, gcx, gcy, gcz, gR = grads
    grad_norm = jnp.sqrt(gs * gs + gt * gt)
    grad_norm = jnp.maximum(grad_norm, 1e-30)
    nhat = jnp.stack([gs, gt], axis=1) / grad_norm[:, None]  # points INSIDE

    # radiance on both sides: eps is half a pixel by default
    eps = f32(eps_px) / f32(max(width, height))
    st_in = st + eps * nhat
    st_out = st - eps * nhat
    f_in = _edge_radiance(scene, cam, st_in, spp_edge, max_depth,
                          attenuate_emission, t_min, seed, time)
    f_out = _edge_radiance(scene, cam, st_out, spp_edge, max_depth,
                           attenuate_emission, t_min, seed + 1, time)

    # cotangent at each edge point's pixel (zero outside the frame)
    px = jnp.floor(st[:, 0] * width).astype(jnp.int32)
    py = jnp.floor(st[:, 1] * height).astype(jnp.int32)
    inside = ((px >= 0) & (px < width) & (py >= 0) & (py < height))
    pxc = jnp.clip(px, 0, width - 1)
    pyc = jnp.clip(py, 0, height - 1)
    ct = image_cotangent[pyc, pxc, :] * inside[:, None].astype(f32)
    gweight = f32(width * height) * jnp.sum(ct * (f_in - f_out), axis=1)

    # line integral:  sum_k g·Δf · (∂G/∂θ)/|∇G| · |x'| · Δphi
    dphi = f32(2.0 * jnp.pi / n_edge)
    base = gweight * line_el * dphi / grad_norm
    return EdgeGrad(center=(jnp.sum(base * gcx), jnp.sum(base * gcy),
                            jnp.sum(base * gcz)),
                    radius=jnp.sum(base * gR))


def _edge_radiance(scene, cam, st, spp, max_depth, attenuate_emission,
                   t_min, seed, time):
    """Mean radiance of pinhole rays through film points st (K,2),
    (K,3) out.  Plain MC with counter-seeded streams (core.rng.seed_perf
    keying, synthetic ids) through the ordinary wavefront tracer."""
    K = st.shape[0]
    f32 = jnp.float32
    o, llc, Hv, Vv = _cam_vectors(cam)
    s = jnp.tile(st[:, 0], spp)
    t = jnp.tile(st[:, 1], spp)
    dirs = (llc[None, :] + s[:, None] * Hv[None, :]
            + t[:, None] * Vv[None, :] - o[None, :])
    n = K * spp
    ids = jnp.arange(n, dtype=jnp.uint32)
    state = rng_mod.seed_perf(ids, jnp.full((n,), jnp.uint32(seed)), seed)
    ov = Vec3(jnp.full((n,), o[0]), jnp.full((n,), o[1]),
              jnp.full((n,), o[2]))
    dv = Vec3(dirs[:, 0], dirs[:, 1], dirs[:, 2])
    tv = jnp.full((n,), f32(time))
    _, rad = trace(scene, ov, dv, tv, state, max_depth,
                   attenuate_emission, t_min)
    rgb = jnp.stack([rad.x, rad.y, rad.z], axis=1).reshape(spp, K, 3)
    return jnp.mean(rgb, axis=0)
