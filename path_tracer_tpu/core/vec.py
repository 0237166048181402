"""Structure-of-arrays 3-vector math for TPU.

The reference (triSYCL/path_tracer) represents points/colors/directions as
``sycl::float3`` values manipulated one ray at a time
(``/root/reference/include/vec.hpp:8-35``).  On TPU the idiomatic layout is the
transpose: a *batch* of vectors is three separate ``(N, ...)`` float32 arrays,
one per component, so that every vector operation lowers to pure elementwise
VPU work on well-tiled arrays (last dim 128-aligned once batched) and dot
products against per-primitive tables become MXU matmuls.

``Vec3`` is a pytree NamedTuple; every op broadcasts like jnp.  All math is
float32 to match the reference's ``real_t = float``
(``/root/reference/include/vec.hpp:8``).

Operation-order note: ``length_squared`` in the reference uses fused fma
(``vec.hpp:11-13``).  We use the same association order ``x*x + (y*y + z*z)``
(without forcing fma) and use the *same* order in the NumPy parity oracle, so
the vectorized renderer and the oracle agree bit-for-bit with each other.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    """A batch of 3-vectors stored as three component arrays (SoA)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- constructors -------------------------------------------------
    @staticmethod
    def full(shape, x: float, y: float, z: float, dtype=jnp.float32) -> "Vec3":
        return Vec3(
            jnp.full(shape, x, dtype),
            jnp.full(shape, y, dtype),
            jnp.full(shape, z, dtype),
        )

    @staticmethod
    def from_scalar(x: Scalar, y: Scalar, z: Scalar) -> "Vec3":
        return Vec3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                    jnp.asarray(z, jnp.float32))

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype)
        return Vec3(z, z, z)

    @staticmethod
    def stack_last(v: "Vec3") -> jnp.ndarray:
        """(..., 3) dense view — host-side convenience only (bad TPU layout)."""
        return jnp.stack([v.x, v.y, v.z], axis=-1)

    @staticmethod
    def from_last(a) -> "Vec3":
        a = jnp.asarray(a, jnp.float32)
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    # ---- arithmetic ---------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):  # elementwise (Hadamard), like sycl::float3*
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)


def dot(a: Vec3, b: Vec3) -> jnp.ndarray:
    """Association order matches length_squared: x + (y + z)."""
    return a.x * b.x + (a.y * b.y + a.z * b.z)


def length_squared(v: Vec3) -> jnp.ndarray:
    # Reference: sycl::fma(x,x, fma(y,y, z*z)) — vec.hpp:11-13.
    return v.x * v.x + (v.y * v.y + v.z * v.z)


def length(v: Vec3) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v))


def unit_vector(v: Vec3) -> Vec3:
    # Reference: v / sycl::length(v) — vec.hpp:23.
    return v / length(v)


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def reflect(v: Vec3, n: Vec3) -> Vec3:
    # Reference: v - 2*dot(v,n)*n — vec.hpp:26.
    return v - n * (2.0 * dot(v, n))


def grad_safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a finite gradient at x <= 0.

    Primal: sqrt(x) for x > 0, 0 otherwise (the reference's sqrt(negative)
    would be NaN — a measure-zero divergence, documented).  The double-where
    keeps the backward pass free of the inf * 0 = NaN that plain
    ``sqrt(where(m, x, 0))`` produces for masked-out lanes."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def refract(uv: Vec3, n: Vec3, etai_over_etat: jnp.ndarray) -> Vec3:
    # Reference: vec.hpp:29-35.  grad_safe: at exact TIR the sqrt argument
    # hits 0 and the plain backward would be inf.
    cos_theta = jnp.minimum(-dot(uv, n), 1.0)
    r_out_perp = (uv + n * cos_theta) * etai_over_etat
    r_out_parallel = n * (-grad_safe_sqrt(jnp.abs(1.0 - length_squared(r_out_perp))))
    return r_out_perp + r_out_parallel


def where(mask: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    """Lane-select between two vector batches."""
    return Vec3(jnp.where(mask, a.x, b.x),
                jnp.where(mask, a.y, b.y),
                jnp.where(mask, a.z, b.z))


def lerp(a: Vec3, b: Vec3, t: jnp.ndarray) -> Vec3:
    return a * (1.0 - t) + b * t
