"""Gradients through the PALLAS path (diff.pallas_vjp record-and-replay
custom VJP) — the production gradient route.

Primary contract: the pallas VJP implements the SAME detached-sampling
estimator as the jnp differentiable path (integrator.trace
differentiable=True), so their gradients agree tightly on any config.
Secondary: on the smooth configs where the jnp-path FD tests hold
(tests/test_grad.py), the pallas gradients match central finite
differences of the pallas forward itself.

Reference quantities being differentiated: material.hpp:11-131 (albedo,
fuzz, ior, emission), sphere.hpp:59-106 (geometry interior terms),
camera.hpp:93-100 (optics)."""
import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.camera import Camera
from path_tracer_tpu.engine.integrator import camera_rays, trace
from path_tracer_tpu.scene.builder import SceneBuilder
from path_tracer_tpu.diff.pallas_vjp import make_render_grad

CAM = Camera.create((0, 0.2, 0.6), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0,
                    1.6)
W = H = 12
SPP = 4
DEPTH = 4
N = W * H
PIX = jnp.tile(jnp.arange(N, dtype=jnp.uint32), SPP)
SAMP = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), N)


def _scene():
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_sphere((0, 0, -1), 0.5, sb.lambertian((0.5, 0.2, 0.3)))
    sb.add_sphere((0, 1.2, -1), 0.3, sb.light((4.0, 4.0, 4.0)))
    return sb.build()


def _pallas_loss_fn():
    f = make_render_grad(W, H, PIX, SAMP, max_depth=DEPTH, attenuate=True)
    return lambda scene, cam: jnp.mean(f(scene, cam))


def _jnp_loss(scene, cam):
    state = rng_mod.seed_perf(PIX, SAMP, 0)
    state, o, d, t = camera_rays(cam, W, H, PIX, state)
    _, rad = trace(scene, o, d, t, state, DEPTH, attenuate_emission=True,
                   differentiable=True)
    return (jnp.mean(rad.x) + jnp.mean(rad.y) + jnp.mean(rad.z)) / 3.0


def _set_albedo(scene, a):
    c1 = scene.textures.c1
    c1 = type(c1)(c1.x.at[1].set(a), c1.y, c1.z)
    return scene._replace(textures=scene.textures._replace(c1=c1))


def test_albedo_grad_matches_jnp_and_fd():
    ploss = _pallas_loss_fn()

    def lp(a):
        return ploss(_set_albedo(_scene(), a), CAM)

    def lj(a):
        return _jnp_loss(_set_albedo(_scene(), a), CAM)

    x0 = jnp.float32(0.5)
    gp = float(jax.grad(lp)(x0))
    gj = float(jax.grad(lj)(x0))
    eps = 1e-2
    fd = (float(lp(x0 + eps)) - float(lp(x0 - eps))) / (2 * eps)
    assert gp > 0
    np.testing.assert_allclose(gp, gj, rtol=1e-3)
    np.testing.assert_allclose(gp, fd, rtol=2e-2)


def test_light_intensity_grad_matches_jnp_and_fd():
    ploss = _pallas_loss_fn()

    def set_light(scene, v):
        c1 = scene.textures.c1
        idx = c1.x.shape[0] - 1
        c1 = type(c1)(c1.x.at[idx].set(v), c1.y.at[idx].set(v),
                      c1.z.at[idx].set(v))
        return scene._replace(textures=scene.textures._replace(c1=c1))

    def lp(v):
        return ploss(set_light(_scene(), v), CAM)

    def lj(v):
        return _jnp_loss(set_light(_scene(), v), CAM)

    x0 = jnp.float32(4.0)
    gp = float(jax.grad(lp)(x0))
    gj = float(jax.grad(lj)(x0))
    eps = 1e-2
    fd = (float(lp(x0 + eps)) - float(lp(x0 - eps))) / (2 * eps)
    assert gp > 0
    np.testing.assert_allclose(gp, gj, rtol=1e-3)
    np.testing.assert_allclose(gp, fd, rtol=2e-2)


def test_geometry_and_camera_grads_finite_and_match_jnp():
    """Interior-term geometry gradients: finite, and the pallas estimator
    equals the jnp estimator (silhouette terms are outside both — see
    tests/test_grad.py::test_grad_radius_finite)."""
    ploss = _pallas_loss_fn()

    def set_radius(scene, r):
        rad = scene.spheres.radius.at[1].set(r)
        return scene._replace(spheres=scene.spheres._replace(radius=rad))

    gp = float(jax.grad(lambda r: ploss(set_radius(_scene(), r), CAM))(
        jnp.float32(0.5)))
    gj = float(jax.grad(lambda r: _jnp_loss(set_radius(_scene(), r), CAM))(
        jnp.float32(0.5)))
    assert np.isfinite(gp)
    np.testing.assert_allclose(gp, gj, rtol=5e-3, atol=1e-5)

    def cam_loss(vfov):
        cam = Camera.create((0, 0.2, 0.6), (0, 0, -1), (0, 1, 0), vfov,
                            1.0, 0.0, 1.6)
        return ploss(_scene(), cam)

    gc = float(jax.grad(cam_loss)(jnp.float32(60.0)))
    assert np.isfinite(gc)


def test_metal_fuzz_grad_matches_fd_sky_config():
    """Sky-dominated metal scene (the jnp FD test's config): fuzz enters
    linearly with the ball draw detached, so interior grad tracks FD."""
    sb = SceneBuilder()
    sb.add_sphere((0, 0, -1), 0.5, sb.metal((0.9, 0.9, 0.9), 0.2))
    base = sb.build()
    ploss = _pallas_loss_fn()

    def lp(fz):
        scene = base._replace(materials=base.materials._replace(
            param=base.materials.param.at[0].set(fz)))
        return ploss(scene, CAM)

    x0 = jnp.float32(0.2)
    g = float(jax.grad(lp)(x0))
    eps = 1e-2
    fd = (float(lp(x0 + eps)) - float(lp(x0 - eps))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.15, atol=2e-4)


def test_dielectric_ior_grad_finite_matches_jnp():
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_sphere((0, 0, -1), 0.5, sb.dielectric(1.5, (1.0, 1.0, 1.0)))
    base = sb.build()
    ploss = _pallas_loss_fn()

    def lp(ior):
        scene = base._replace(materials=base.materials._replace(
            param=base.materials.param.at[1].set(ior)))
        return ploss(scene, CAM)

    def lj(ior):
        scene = base._replace(materials=base.materials._replace(
            param=base.materials.param.at[1].set(ior)))
        return _jnp_loss(scene, CAM)

    x0 = jnp.float32(1.5)
    gp = float(jax.grad(lp)(x0))
    gj = float(jax.grad(lj)(x0))
    assert np.isfinite(gp)
    np.testing.assert_allclose(gp, gj, rtol=2e-2, atol=1e-5)


def test_medium_density_grad_finite():
    """Smoke sphere: density gradient flows through the recorded event t
    (constant_medium.hpp:28-77); contract is finiteness + jnp agreement."""
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.6, 0.6, 0.6)))
    sb.add_constant_medium(("sphere", (0, 0, -1), 0.5), 1.5,
                           (0.8, 0.8, 0.8))
    base = sb.build()
    ploss = _pallas_loss_fn()

    def lp(nid):
        med = base.media._replace(
            neg_inv_density=base.media.neg_inv_density.at[0].set(nid))
        return ploss(base._replace(media=med), CAM)

    x0 = jnp.float32(float(base.media.neg_inv_density[0]))
    g = float(jax.grad(lp)(x0))
    assert np.isfinite(g)


def test_final_scene_grad_finite():
    """Every class + image textures through the VJP at once."""
    from path_tracer_tpu.scene.presets import build_final_scene
    scene, cam = build_final_scene(1.5)
    w, h, spp, depth = 16, 8, 2, 4
    n = w * h
    pix = jnp.tile(jnp.arange(n, dtype=jnp.uint32), spp)
    samp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), n)
    f = make_render_grad(w, h, pix, samp, max_depth=depth, attenuate=True)

    from path_tracer_tpu.diff.params import combine, partition
    params, static = partition((scene, cam))

    def loss(p):
        s, c = combine(p, static)
        return jnp.mean(f(s, c))

    g = jax.grad(loss)(params)
    leaves = [x for x in jax.tree_util.tree_leaves(g) if x is not None]
    assert leaves, "no gradient leaves"
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    nonzero = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert nonzero > 0.0
