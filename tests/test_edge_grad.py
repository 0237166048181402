"""Silhouette-aware geometry gradients vs central finite differences
(BASELINE correctness target "gradients allclose vs finite differences";
round-2 verdict ask #8).

The interior (detached-sampling) estimator alone cannot match FD for sphere
radius/center — FD captures the silhouette/coverage term (rays flipping
across the hit boundary, sphere.hpp:59-106).  diff/edge.py adds the
edge-sampling boundary integral; interior + boundary must match FD on a
smooth-but-moving-edge config: one lambertian sphere over the sky gradient,
pinhole camera (no aperture/motion blur, so the silhouette is a sharp curve
and the only discontinuity).

FD uses common random numbers (same seed both sides), so its noise is
dominated by the finite sampling of the flip band; tolerances reflect that
(the spike run at 48x48x32spp matched within 1.6%)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.camera import Camera
from path_tracer_tpu.diff.edge import sphere_silhouette_grad
from path_tracer_tpu.engine.integrator import camera_rays, trace
from path_tracer_tpu.scene.builder import SceneBuilder

W = H = 40
SPP = 24
DEPTH = 4
CAM = Camera.create((0, 0, 1), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 2.0)
R0 = 0.5


def _build(radius, cx):
    sb = SceneBuilder()
    sb.add_sphere((0.0, 0.0, -1.0), R0, sb.lambertian((0.2, 0.3, 0.6)))
    sc = sb.build()
    sph = sc.spheres
    sph = sph._replace(
        radius=sph.radius.at[0].set(radius),
        c0=type(sph.c0)(sph.c0.x.at[0].set(cx), sph.c0.y, sph.c0.z),
        c1=type(sph.c1)(sph.c1.x.at[0].set(cx), sph.c1.y, sph.c1.z))
    return sc._replace(spheres=sph)


def _image(radius, cx):
    """(SPP, H, W, 3) per-sample radiance with fixed CRN streams."""
    sc = _build(radius, cx)
    n = W * H
    pix = jnp.tile(jnp.arange(n, dtype=jnp.uint32), SPP)
    samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), n)
    state = rng_mod.seed_perf(pix, samp, 0)
    state, o, d, t = camera_rays(CAM, W, H, pix, state)
    _, rad = trace(sc, o, d, t, state, DEPTH, attenuate_emission=False,
                   differentiable=True)
    return jnp.stack([rad.x, rad.y, rad.z], -1).reshape(SPP, H, W, 3)


def _masked_loss(radius, cx, mask):
    img = jnp.mean(_image(radius, cx), axis=0)          # (H, W, 3)
    return jnp.sum(img * mask) / jnp.float32(W * H * 3)


def _check(param_grad_total, fd, rtol):
    assert np.isfinite(param_grad_total) and np.isfinite(fd)
    assert abs(param_grad_total - fd) <= rtol * max(abs(fd), 1e-3), (
        f"total {param_grad_total} vs FD {fd}")


@pytest.mark.parametrize("h", [0.03])
def test_radius_grad_matches_fd_with_edge_term(h):
    mask = jnp.ones((H, W, 3), jnp.float32)
    lossR = jax.jit(lambda r: _masked_loss(r, jnp.float32(0.0), mask))
    g_int = float(jax.jit(jax.grad(
        lambda r: _masked_loss(r, jnp.float32(0.0), mask)))(jnp.float32(R0)))
    ct = mask / jnp.float32(W * H * 3)
    eg = sphere_silhouette_grad(_build(jnp.float32(R0), jnp.float32(0.0)),
                                CAM, W, H, 0, ct, n_edge=192, spp_edge=48,
                                max_depth=DEPTH, seed=5)
    fd = (float(lossR(jnp.float32(R0 + h)))
          - float(lossR(jnp.float32(R0 - h)))) / (2 * h)
    # interior alone must NOT explain FD (the edge term dominates) …
    assert abs(g_int - fd) > 10 * abs(g_int + float(eg.radius) - fd)
    # … and interior + boundary must.
    _check(g_int + float(eg.radius), fd, rtol=0.12)


@pytest.mark.parametrize("h", [0.04])
def test_center_grad_matches_fd_with_edge_term(h):
    # left-half-of-image loss: moving the sphere +x sweeps coverage out of
    # the weighted region, giving a clean nonzero coverage gradient
    mask = (jnp.arange(W) < W // 2).astype(jnp.float32)
    mask = jnp.broadcast_to(mask[None, :, None], (H, W, 3))
    lossC = jax.jit(lambda c: _masked_loss(jnp.float32(R0), c, mask))
    g_int = float(jax.jit(jax.grad(
        lambda c: _masked_loss(jnp.float32(R0), c, mask)))(jnp.float32(0.0)))
    ct = mask / jnp.float32(W * H * 3)
    eg = sphere_silhouette_grad(_build(jnp.float32(R0), jnp.float32(0.0)),
                                CAM, W, H, 0, ct, n_edge=192, spp_edge=48,
                                max_depth=DEPTH, seed=5)
    fd = (float(lossC(jnp.float32(h))) - float(lossC(jnp.float32(-h)))) / (2 * h)
    _check(g_int + float(eg.center[0]), fd, rtol=0.15)
