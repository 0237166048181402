"""Vectorized counter-seeded xorshift32 RNG with the reference's sampling
transforms.

The reference uses a per-work-item Marsaglia xorshift32 engine
(``/root/reference/include/xorshift.hpp:72-74``: ``s ^= s>>7; s ^= s<<1;
s ^= s>>9``) wrapped by ``LocalPseudoRNG``
(``/root/reference/include/rtweekend.hpp:33-92``) whose sampling transforms are
*intentionally non-uniform* (``unit_vec``/``in_unit_ball``/``in_unit_disk`` are
not uniform on the sphere/ball/disk).  Image parity requires reproducing those
transforms exactly, so this module implements them bit-for-bit.

TPU-native design: instead of one sequential generator per work-item we carry a
``(N,)`` uint32 state *per ray lane* and advance all lanes in lockstep — six
integer VPU ops per draw.  Two seeding modes:

* **parity**: seed = pixel linear id (libstdc++ ``std::hash<size_t>`` is the
  identity, so this reproduces ``render.hpp:130-131``), samples iterated
  sequentially per pixel — bit-identical streams to the reference.
* **perf**: seed = splitmix32 hash of a (pixel, sample) counter — independent
  streams so the sample axis parallelizes (counter-based a la threefry, but
  with a much cheaper per-draw cost; statistical quality is adequate for MC
  rendering and the *transforms* still match the reference's distributions).

Data-dependent draws (e.g. the smoke medium's ``log(rng())`` —
``constant_medium.hpp:65`` — or the dielectric's conditional Fresnel draw —
``material.hpp:80-84``) are modeled with *masked advancement*: lanes that the
reference would not have drawn keep their previous state.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .vec import Vec3

PI = 3.1415926535897932385  # rtweekend.hpp:22

# Default xorshift32 state (Marsaglia), xorshift.hpp:18.
INITIAL_STATE = 2463534242

# numpy, not jnp: module import must not initialize the XLA
# backend (jax.distributed.initialize comes first on multihost)
_F32_SCALE = np.float32(1.0 / (1 << 32))


def xs32_step(state: jnp.ndarray) -> jnp.ndarray:
    """One xorshift32 update (xorshift.hpp:72-74)."""
    state = state ^ (state >> 7)
    state = state ^ (state << 1)
    state = state ^ (state >> 9)
    return state


def _masked(new_state: jnp.ndarray, old_state: jnp.ndarray,
            mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return new_state
    return jnp.where(mask, new_state, old_state)


def u32_to_f01(u: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float in [0, 1] exactly as the C++ ``generator() * scale``
    (rtweekend.hpp:39-42): round-to-nearest f32 conversion then multiply by
    2^-32.  Note u = 0xFFFFFFFF yields exactly 1.0f."""
    return u.astype(jnp.float32) * _F32_SCALE


def next_f01(state: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw float in [0,1].  Masked-off lanes keep state; their value is
    garbage and must not be used."""
    s2 = xs32_step(state)
    return _masked(s2, state, mask), u32_to_f01(s2)


def next_frange(state: jnp.ndarray, lo, hi,
                mask: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """min + (max-min)*float_t() — rtweekend.hpp:45-48."""
    state, f = next_f01(state, mask)
    return state, jnp.float32(lo) + (jnp.float32(hi) - jnp.float32(lo)) * f


def next_vec(state: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, Vec3]:
    """vec_t(): three sequential draws — rtweekend.hpp:51."""
    state, x = next_f01(state, mask)
    state, y = next_f01(state, mask)
    state, z = next_f01(state, mask)
    return state, Vec3(x, y, z)


def next_unit_vec(state: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, Vec3]:
    """The reference's (non-uniform) random unit vector —
    rtweekend.hpp:60-67.  Consumes exactly 3 draws."""
    state, x = next_frange(state, -1.0, 1.0, mask)
    maxy = jnp.sqrt(1.0 - x * x)
    state, y = next_frange_dyn(state, -maxy, maxy, mask)
    absz = jnp.sqrt(maxy * maxy - y * y)
    state, u = next_f01(state, mask)
    z = jnp.where(u > 0.5, absz, -absz)
    return state, Vec3(x, y, z)


def next_frange_dyn(state: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """float_t(min, max) with per-lane bounds."""
    state, f = next_f01(state, mask)
    return state, lo + (hi - lo) * f


def next_in_unit_ball(state: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, Vec3]:
    """Polar-coordinate ball sample (NOT volume-uniform) —
    rtweekend.hpp:70-80.  Consumes exactly 3 draws."""
    state, r = next_f01(state, mask)
    state, theta = next_frange(state, 0.0, 2.0 * PI, mask)
    state, phi = next_frange(state, 0.0, PI, mask)
    plan_seed = r * jnp.sin(phi)
    z = r * jnp.cos(phi)
    return state, Vec3(plan_seed * jnp.cos(theta), plan_seed * jnp.sin(theta), z)


def next_in_unit_disk(state: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, Vec3]:
    """x-then-conditional-y disk sample (NOT area-uniform) —
    rtweekend.hpp:83-88.  Consumes exactly 2 draws."""
    state, x = next_frange(state, -1.0, 1.0, mask)
    maxy = jnp.sqrt(1.0 - x * x)
    state, y = next_frange_dyn(state, -maxy, maxy, mask)
    return state, Vec3(x, y, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Seeding
# ---------------------------------------------------------------------------

def seed_parity(linear_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel seed exactly as render.hpp:130-131: libstdc++'s
    std::hash<size_t> is the identity, truncated to the uint32 engine state.
    (Pixel 0 therefore gets state 0, whose xorshift stream is all zeros — a
    reference quirk we reproduce.)"""
    return linear_ids.astype(jnp.uint32)


def splitmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Well-mixed 32-bit hash for perf-mode stream seeding."""
    x = x.astype(jnp.uint32)
    x = (x + jnp.uint32(0x9E3779B9)).astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x21F0AAAD)
    x = (x ^ (x >> 15)) * jnp.uint32(0x735A2D97)
    x = x ^ (x >> 15)
    return x


def seed_perf(pixel_ids: jnp.ndarray, sample_ids: jnp.ndarray,
              base_seed: int = 0) -> jnp.ndarray:
    """Counter-based stream seed per (pixel, sample): hash the counter so
    streams are decorrelated; never 0 (xorshift fixed point)."""
    h = splitmix32(pixel_ids.astype(jnp.uint32)
                   ^ splitmix32(sample_ids.astype(jnp.uint32)
                                ^ jnp.uint32(base_seed)))
    return jnp.where(h == 0, jnp.uint32(INITIAL_STATE), h)
