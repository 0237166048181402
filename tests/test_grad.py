"""Gradient checks vs central finite differences (BASELINE.json correctness
target).  Continuous parameters (albedo, emission, camera) should match FD
tightly; geometric parameters (radius/center) match away from silhouettes
with looser tolerance (the detached-sampling estimator ignores the
measure-zero edge terms, as does FD at small epsilon on smooth configs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.camera import Camera
from path_tracer_tpu.core.vec import Vec3
from path_tracer_tpu.engine.integrator import camera_rays, trace
from path_tracer_tpu.scene.builder import SceneBuilder


def _scene(albedo_r=0.5, radius=0.5, light=4.0):
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_sphere((0, 0, -1), radius, sb.lambertian((albedo_r, 0.2, 0.3)))
    sb.add_sphere((0, 1.2, -1), 0.3, sb.light((light, light, light)))
    return sb.build()


CAM = Camera.create((0, 0.2, 0.6), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.6)
W = H = 12
SPP = 4
DEPTH = 4


def _mean_radiance(scene):
    n = W * H
    pix = jnp.tile(jnp.arange(n, dtype=jnp.uint32), SPP)
    samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), n)
    state = rng_mod.seed_perf(pix, samp, 0)
    state, o, d, t = camera_rays(CAM, W, H, pix, state)
    _, rad = trace(scene, o, d, t, state, DEPTH, attenuate_emission=True,
                   differentiable=True)
    return (jnp.mean(rad.x) + jnp.mean(rad.y) + jnp.mean(rad.z)) / 3.0


def test_grad_albedo_matches_fd():
    def loss_from_albedo(a):
        # lambertian albedo lives in the SOLID TEXTURE's c1 row (builder
        # wires a texture per lambertian; materials.color is only the
        # metal/dielectric plain color) — perturbing materials.color here
        # would make this test vacuously compare 0 to 0
        scene = _scene()
        c1 = scene.textures.c1
        c1 = type(c1)(c1.x.at[1].set(a), c1.y, c1.z)
        scene = scene._replace(textures=scene.textures._replace(c1=c1))
        return _mean_radiance(scene)

    g = float(jax.grad(loss_from_albedo)(jnp.float32(0.5)))
    eps = 1e-2
    fd = (float(loss_from_albedo(jnp.float32(0.5 + eps)))
          - float(loss_from_albedo(jnp.float32(0.5 - eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert g > 0
    np.testing.assert_allclose(g, fd, rtol=2e-2)


def test_grad_light_intensity_matches_fd():
    def loss_from_light(v):
        scene = _scene()
        c1 = scene.textures.c1
        # the light's solid texture is the last texture row
        idx = c1.x.shape[0] - 1
        c1 = type(c1)(c1.x.at[idx].set(v), c1.y.at[idx].set(v),
                      c1.z.at[idx].set(v))
        scene = scene._replace(textures=scene.textures._replace(c1=c1))
        return _mean_radiance(scene)

    g = float(jax.grad(loss_from_light)(jnp.float32(4.0)))
    eps = 1e-2
    fd = (float(loss_from_light(jnp.float32(4.0 + eps)))
          - float(loss_from_light(jnp.float32(4.0 - eps)))) / (2 * eps)
    # emission enters radiance linearly -> tight match
    np.testing.assert_allclose(g, fd, rtol=2e-2)
    assert g > 0


def test_grad_radius_finite():
    """Geometry gradients through the detached-decision estimator cover the
    INTERIOR (shading) terms only; finite differences additionally capture
    silhouette/coverage terms, which dominate for a radius change.  The
    contract tested here is therefore finiteness and differentiability —
    silhouette-aware estimators (edge sampling / reparameterization) are
    future work."""
    def loss_from_radius(r):
        scene = _scene()
        rad = scene.spheres.radius.at[1].set(r)
        scene = scene._replace(spheres=scene.spheres._replace(radius=rad))
        return _mean_radiance(scene)

    g = float(jax.grad(loss_from_radius)(jnp.float32(0.5)))
    assert np.isfinite(g)

    # center moves shift shading continuously too — must stay finite
    def loss_from_cy(cy):
        scene = _scene()
        c0y = scene.spheres.c0.y.at[1].set(cy)
        c1y = scene.spheres.c1.y.at[1].set(cy)
        c0 = type(scene.spheres.c0)(scene.spheres.c0.x, c0y,
                                    scene.spheres.c0.z)
        c1 = type(scene.spheres.c1)(scene.spheres.c1.x, c1y,
                                    scene.spheres.c1.z)
        scene = scene._replace(
            spheres=scene.spheres._replace(c0=c0, c1=c1))
        return _mean_radiance(scene)

    g2 = float(jax.grad(loss_from_cy)(jnp.float32(0.0)))
    assert np.isfinite(g2)


def test_grad_camera_params_finite():
    def loss_from_vfov(vfov):
        cam = Camera.create((0, 0.2, 0.6), (0, 0, -1), (0, 1, 0), vfov,
                            1.0, 0.0, 1.6)
        scene = _scene()
        n = W * H
        pix = jnp.tile(jnp.arange(n, dtype=jnp.uint32), SPP)
        samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), n)
        state = rng_mod.seed_perf(pix, samp, 0)
        state, o, d, t = camera_rays(cam, W, H, pix, state)
        _, r = trace(scene, o, d, t, state, DEPTH, attenuate_emission=True,
                     differentiable=True)
        return (jnp.mean(r.x) + jnp.mean(r.y) + jnp.mean(r.z)) / 3.0

    g = float(jax.grad(loss_from_vfov)(jnp.float32(60.0)))
    # vfov shifts silhouettes across pixels, so FD is dominated by the
    # discrete resampling terms the interior estimator intentionally omits;
    # the tested contract is a finite, well-defined gradient.
    assert np.isfinite(g)


def _metal_scene():
    sb = SceneBuilder()
    sb.add_sphere((0, 0, -1), 0.5, sb.metal((0.9, 0.9, 0.9), 0.2))
    return sb.build()


def test_grad_metal_fuzz_matches_fd():
    """Fuzz enters the scattered direction linearly (dir = reflect +
    fuzz*ball, material.hpp:42-43) with the ball draw detached, so the
    interior gradient should track FD on a sky-dominated config (the only
    discontinuity is the absorb test, rare at small fuzz)."""
    base = _metal_scene()

    def loss_from_fuzz(f):
        scene = base._replace(materials=base.materials._replace(
            param=base.materials.param.at[0].set(f)))
        return _mean_radiance(scene)

    x0 = jnp.float32(0.2)
    g = float(jax.grad(loss_from_fuzz)(x0))
    eps = 1e-2
    fd = (float(loss_from_fuzz(x0 + eps))
          - float(loss_from_fuzz(x0 - eps))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.15, atol=2e-4)


def _diel_scene():
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_sphere((0, 0, -1), 0.5, sb.dielectric(1.5, (1.0, 1.0, 1.0)))
    return sb.build()


def test_grad_dielectric_ior_finite_and_direction():
    """IOR gradients flow through refract() and Schlick reflectance; the
    reflect-vs-refract branch is detached.  Contract: finite, and matches
    the FD sign on a smooth config."""
    base = _diel_scene()

    def loss_from_ior(ior):
        scene = base._replace(materials=base.materials._replace(
            param=base.materials.param.at[1].set(ior)))
        return _mean_radiance(scene)

    x0 = jnp.float32(1.5)
    g = float(jax.grad(loss_from_ior)(x0))
    assert np.isfinite(g)
    eps = 5e-2
    fd = (float(loss_from_ior(x0 + eps))
          - float(loss_from_ior(x0 - eps))) / (2 * eps)
    if abs(fd) > 1e-4:   # sign agreement when FD is not noise-dominated
        assert np.sign(g) == np.sign(fd)


def _medium_scene():
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_constant_medium(("sphere", (0.0, 0.0, -1.0), 0.5), 1.0,
                           (0.9, 0.9, 0.9))
    sb.add_sphere((0, 1.2, -1), 0.3, sb.light((4.0, 4.0, 4.0)))
    return sb.build()


def test_grad_medium_density_finite():
    """neg_inv_density enters hit_distance linearly
    (constant_medium.hpp:65) with the log(u) draw detached."""
    base = _medium_scene()

    def loss_from_nid(nid):
        scene = base._replace(media=base.media._replace(
            neg_inv_density=base.media.neg_inv_density.at[0].set(nid)))
        return _mean_radiance(scene)

    x0 = jnp.float32(-1.0)
    g = float(jax.grad(loss_from_nid)(x0))
    assert np.isfinite(g)
