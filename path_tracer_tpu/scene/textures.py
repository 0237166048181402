"""Branchless batched texture evaluation.

The reference dispatches ``texture_t = std::variant<checker, solid, image>``
per lookup with dev_visit (``/root/reference/include/texture.hpp:154``).  Here
a lane batch evaluates *all* texture types and lane-selects by type id —
gathers against the small texture table plus one row-gather into the shared
uint8 image atlas (the reborn ``image_texture::freeze()`` buffer,
texture.hpp:126-131).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from . import types as T


def texture_value(textures: T.Textures, tex_id: jnp.ndarray,
                  u: jnp.ndarray, v: jnp.ndarray, p: Vec3) -> Vec3:
    """Evaluate texture ``tex_id`` (per lane) at surface coords (u, v) and
    world hit point p.  Matches:

    * solid: constant color (texture.hpp:18-29)
    * checker: sin(10x)sin(10y)sin(10z) of the WORLD hit point selects
      odd (<0) vs even (texture.hpp:42-49)
    * image: nearest-neighbor atlas fetch with cyclic frequency and
      flipped v (texture.hpp:135-151); scale 1/255

    Divergence from reference (documented): out-of-range texel indices are
    clamped instead of reading out of bounds (the reference would index a
    std::size_t wraparound for negative u/v, which is UB).
    """
    from ..engine.intersect import gather_rows
    (ttype, c1x, c1y, c1z, c2x, c2y, c2z, wf, hf, off_f,
     freq) = gather_rows(tex_id, textures.ttype, textures.c1.x,
                         textures.c1.y, textures.c1.z, textures.c2.x,
                         textures.c2.y, textures.c2.z, textures.width,
                         textures.height, textures.offset, textures.freq)
    c1 = Vec3(c1x, c1y, c1z)
    c2 = Vec3(c2x, c2y, c2z)

    # checker (evaluates also for non-checker lanes; c1/c2 then unused)
    sines = (jnp.sin(10.0 * p.x) * jnp.sin(10.0 * p.y)
             * jnp.sin(10.0 * p.z))
    checker = Vec3(
        jnp.where(sines < 0.0, c1.x, c2.x),
        jnp.where(sines < 0.0, c1.y, c2.y),
        jnp.where(sines < 0.0, c1.z, c2.z),
    )

    # image
    w = wf.astype(jnp.int32)
    h = hf.astype(jnp.int32)
    off = off_f.astype(jnp.int32)
    # std::size_t truncation of fmod(u*freq, 1)*(w-1) — texture.hpp:139-143.
    fu = jnp.fmod(u * freq, 1.0)
    fv = jnp.fmod(v * freq, 1.0)
    i = jnp.clip((fu * (w - 1).astype(jnp.float32)).astype(jnp.int32),
                 0, w - 1)
    j = jnp.clip(((1.0 - fv) * (h - 1).astype(jnp.float32)).astype(jnp.int32),
                 0, h - 1)
    pix = off + j * w + i
    pix = jnp.clip(pix, 0, textures.atlas.shape[0] - 1)
    texel = jnp.take(textures.atlas, pix, axis=0).astype(jnp.float32)
    scale = jnp.float32(1.0 / 255.0)
    image = Vec3(texel[..., 0] * scale, texel[..., 1] * scale,
                 texel[..., 2] * scale)

    is_checker = ttype == T.TEX_CHECKER
    is_image = ttype == T.TEX_IMAGE
    out_x = jnp.where(is_image, image.x, jnp.where(is_checker, checker.x, c1.x))
    out_y = jnp.where(is_image, image.y, jnp.where(is_checker, checker.y, c1.y))
    out_z = jnp.where(is_image, image.z, jnp.where(is_checker, checker.z, c1.z))
    return Vec3(out_x, out_y, out_z)
