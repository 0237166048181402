"""Positionable thin-lens camera with depth of field and motion blur.

Reproduces ``/root/reference/include/camera.hpp:19-101`` semantics: viewport
from vfov/aspect scaled by focus distance, basis w = norm(from-at),
u = norm(vup x w), v = w x u, aperture-disk lens offset, shutter-time draw in
[time0, time1], and an **unnormalized** ray direction (camera.hpp:96-98) —
intersection ``t`` is therefore in units of |direction|, which several
downstream formulas depend on (e.g. smoke optical depth,
constant_medium.hpp:61-64).

The camera is a pytree of f32 scalars built by traced jnp ops, so every
parameter (including derived basis vectors) is differentiable — the reference
computes the same quantities at host construction time (camera.hpp:67-91).
``get_ray`` is vectorized over a lane batch and consumes exactly 3 RNG draws
per lane (disk: 2, time: 1), matching camera.hpp:93-100.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import rng as rng_mod
from .vec import Vec3, cross, length, unit_vector


def _radians(deg):
    return deg * jnp.float32(rng_mod.PI) / jnp.float32(180.0)


class Camera(NamedTuple):
    origin: Vec3            # scalar-leaved Vec3s
    lower_left_corner: Vec3
    horizontal: Vec3
    vertical: Vec3
    u: Vec3
    v: Vec3
    w: Vec3
    lens_radius: jnp.ndarray
    time0: jnp.ndarray
    time1: jnp.ndarray

    @staticmethod
    def create(look_from, look_at, vup, vfov_deg, aspect_ratio, aperture,
               focus_dist, time0=0.0, time1=0.0) -> "Camera":
        """camera.hpp:67-91, all f32."""
        look_from = _as_vec(look_from)
        look_at = _as_vec(look_at)
        vup = _as_vec(vup)
        vfov_deg = jnp.asarray(vfov_deg, jnp.float32)
        aspect_ratio = jnp.asarray(aspect_ratio, jnp.float32)
        aperture = jnp.asarray(aperture, jnp.float32)
        focus_dist = jnp.asarray(focus_dist, jnp.float32)

        theta = _radians(vfov_deg)
        h = jnp.tan(theta / 2.0)
        viewport_height = 2.0 * h
        viewport_width = aspect_ratio * viewport_height

        w = unit_vector(look_from - look_at)
        u = unit_vector(cross(vup, w))
        v = cross(w, u)

        horizontal = u * (focus_dist * viewport_width)
        vertical = v * (focus_dist * viewport_height)
        lower_left_corner = (look_from - horizontal * 0.5 - vertical * 0.5
                             - w * focus_dist)
        return Camera(
            origin=look_from,
            lower_left_corner=lower_left_corner,
            horizontal=horizontal,
            vertical=vertical,
            u=u, v=v, w=w,
            lens_radius=aperture / 2.0,
            time0=jnp.asarray(time0, jnp.float32),
            time1=jnp.asarray(time1, jnp.float32),
        )

    def get_ray(self, s: jnp.ndarray, t: jnp.ndarray, state: jnp.ndarray
                ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
        """Vectorized camera.hpp:93-100.

        Returns (rng_state', origin, direction, time); direction is NOT
        normalized (reference behavior)."""
        state, rd = rng_mod.next_in_unit_disk(state)
        rd = rd * self.lens_radius
        offset = self.u * rd.x + self.v * rd.y
        origin = self.origin + offset
        direction = (self.lower_left_corner + self.horizontal * s
                     + self.vertical * t - self.origin - offset)
        state, time = rng_mod.next_frange_dyn(
            state, jnp.broadcast_to(self.time0, s.shape),
            jnp.broadcast_to(self.time1, s.shape))
        return state, origin, direction, time


def _as_vec(p) -> Vec3:
    if isinstance(p, Vec3):
        return Vec3(jnp.asarray(p.x, jnp.float32), jnp.asarray(p.y, jnp.float32),
                    jnp.asarray(p.z, jnp.float32))
    x, y, z = p
    return Vec3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                jnp.asarray(z, jnp.float32))
