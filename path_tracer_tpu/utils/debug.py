"""Numerical-safety checks — the XLA analogue of the reference's thread
sanitizer mode (CMakeLists.txt:4,76-80 wires TSan into the OpenMP kernel;
commented ASan/UBSan blocks at :81-90).

Data races can't exist under XLA's functional model; the failure modes that
CAN silently corrupt a render are NaN/Inf propagation (negative sqrt args,
0/0 in masked lanes, log(0) in the smoke sampler) and out-of-range gathers.
``checked_render`` jit-compiles a render with jax.experimental.checkify
error tracking for exactly those classes and raises on the first violation;
``assert_image_finite`` is the cheap post-hoc variant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from ..core import rng as rng_mod
from ..core.vec import Vec3
from ..scene import types as T


def assert_image_finite(img, what: str = "image") -> None:
    """Raise with lane details if a rendered image has NaN/Inf pixels."""
    arr = np.asarray(img)
    bad = ~np.isfinite(arr)
    if bad.any():
        idx = np.argwhere(bad.any(axis=-1) if arr.ndim == 3 else bad)[:8]
        raise FloatingPointError(
            f"{what} has {int(bad.sum())} non-finite components; first bad "
            f"pixels (row, col): {idx.tolist()}")


def checked_render(scene: T.Scene, cam, width: int, height: int, spp: int,
                   max_depth: int = 8, attenuate_emission: bool = False,
                   t_min: float = 1e-3, seed: int = 0):
    """Render a (small) frame under checkify float + index checking.

    Returns the (H, W, 3) image; raises checkify.JaxRuntimeError on the
    first NaN/Inf produced anywhere in the traced computation or any
    out-of-bounds gather.  Orders of magnitude slower than the production
    renderers — a debugging tool, sized for debugging configs.
    """
    from ..engine.integrator import camera_rays, trace

    n = width * height
    pix_ids = jnp.arange(n, dtype=jnp.uint32)

    def render_one_spp(s):
        samp = jnp.full((n,), s, jnp.uint32)
        # seed goes INSIDE the hash (a post-hash xor only perturbs low
        # bits the f32 draw conversion cannot see) — matches seed_perf
        # usage in the renderers (engine/integrator.py).
        state = rng_mod.seed_perf(pix_ids, samp, seed)
        state, o, d, t = camera_rays(cam, width, height, pix_ids, state)
        _, rad = trace(scene, o, d, t, state, max_depth,
                       attenuate_emission, t_min)
        return jnp.stack([rad.x, rad.y, rad.z], axis=-1)

    def full(_):
        acc = jnp.zeros((n, 3), jnp.float32)

        def body(s, acc):
            return acc + render_one_spp(s.astype(jnp.uint32))

        acc = jax.lax.fori_loop(0, spp, body, acc)
        return acc / jnp.float32(spp)

    checked = checkify.checkify(
        full, errors=checkify.float_checks | checkify.index_checks)
    err, img = jax.jit(checked)(0)
    err.throw()
    return img.reshape(height, width, 3)
