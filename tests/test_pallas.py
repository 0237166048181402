"""Pallas sphere-fold kernel vs the jnp reference path (interpret mode on
CPU; the same kernel is compiled by Mosaic on TPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.engine.integrator import camera_rays
from path_tracer_tpu.engine.intersect import INF, sphere_t_matrix_mxu
from path_tracer_tpu.scene.presets import build_final_scene


@pytest.fixture(scope="module")
def interp_pallas():
    """Force pallas_call to interpret mode for all kernels."""
    import path_tracer_tpu.ops.pallas.prim_fold as PF
    import path_tracer_tpu.ops.pallas.sphere_fold as SF
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    # drop jit caches so the interpreted call graphs are retraced
    SF.sphere_fold.clear_cache()
    PF.prim_fold.clear_cache()
    try:
        yield
    finally:
        pl.pallas_call = orig
        SF.sphere_fold.clear_cache()
        PF.prim_fold.clear_cache()


@pytest.fixture(scope="module")
def interp_fold(interp_pallas):
    """sphere_fold under interpret mode."""
    import path_tracer_tpu.ops.pallas.sphere_fold as SF
    yield SF.sphere_fold


@pytest.fixture(scope="module")
def final_rays():
    scene, cam = build_final_scene(4 / 3)
    n = 1024
    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros(n, dtype=jnp.uint32)
    state = rng_mod.seed_perf(pix, samp, 0)
    state, o, d, t = camera_rays(cam, 32, 32, pix, state)
    return scene, o, d, t


def test_sphere_fold_matches_jnp(interp_fold, final_rays):
    scene, o, d, t = final_rays
    ts, idx, pref = interp_fold(scene.spheres, o, d, 1e-3, t,
                                scene.media.scan)
    ts, idx = np.asarray(ts), np.asarray(idx)

    tmat = sphere_t_matrix_mxu(scene.spheres, o, d, t, jnp.float32(1e-3),
                               INF)
    t_ref = np.asarray(jnp.min(tmat, axis=1))
    idx_ref = np.asarray(jnp.argmin(tmat, axis=1))
    hit = t_ref < 1e30
    assert hit.mean() > 0.5  # the scene fills most of this view
    # same hit set
    np.testing.assert_array_equal(ts < 1e30, hit)
    # winning sphere identical, t to float tolerance (different but
    # algebraically equal formulas)
    np.testing.assert_array_equal(idx[hit], idx_ref[hit])
    np.testing.assert_allclose(ts[hit], t_ref[hit], rtol=2e-4, atol=1e-5)


def test_sphere_fold_media_prefix(interp_fold, final_rays):
    """prefix_t[m] = min sphere t over scan < media.scan[m]."""
    scene, o, d, t = final_rays
    ts, idx, pref = interp_fold(scene.spheres, o, d, 1e-3, t,
                                scene.media.scan)
    pref = np.asarray(pref)
    tmat = np.asarray(sphere_t_matrix_mxu(scene.spheres, o, d, t,
                                          jnp.float32(1e-3), INF))
    scan = np.asarray(scene.spheres.scan)
    for m, ms in enumerate(np.asarray(scene.media.scan)):
        restricted = np.where((scan < ms)[None, :], tmat, np.inf)
        want = restricted.min(axis=1)
        got = pref[m]
        ok = np.isfinite(want)
        np.testing.assert_allclose(got[ok], want[ok], rtol=2e-4, atol=1e-5)
        assert np.all(got[~ok] >= 1e30)


def test_sphere_fold_moving_spheres(interp_fold):
    """Ray time must select the lerped center (sphere.hpp:51-56)."""
    from path_tracer_tpu.core.vec import Vec3
    from path_tracer_tpu.scene.builder import SceneBuilder
    sb = SceneBuilder()
    m = sb.lambertian((0.5, 0.5, 0.5))
    # sphere moving from x=0 to x=2 over t in [0, 1]
    sb.add_moving_sphere((0.0, 0.0, -3.0), (2.0, 0.0, -3.0), 0.0, 1.0,
                         0.5, m)
    scene = sb.build()
    n = 1024
    o = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    d = Vec3(jnp.zeros(n), jnp.zeros(n), -jnp.ones(n))
    rt = jnp.linspace(0.0, 1.0, n)
    ts, idx, _ = interp_fold(scene.spheres, o, d, 1e-3, rt,
                             jnp.zeros((0,), jnp.int32))
    ts = np.asarray(ts)
    # at time 0 center is on the ray axis -> hit at 2.5; at time 1 the
    # center is 2 units off-axis -> miss
    assert ts[0] == pytest.approx(2.5, abs=1e-5)
    assert ts[-1] >= 1e30


def test_prim_fold_intersect_matches_jnp(interp_pallas, final_rays):
    """Full intersect_scene: megakernel path vs jnp path on the final
    scene — same winner class/material/scan, t equal to tolerance, same
    RNG advancement (media draws)."""
    import jax.numpy as jnp2
    from path_tracer_tpu.core import rng as rng_mod2
    from path_tracer_tpu.engine.intersect import intersect_scene
    scene, o, d, t = final_rays
    n = t.shape[0]
    state = rng_mod2.seed_perf(jnp2.arange(n, dtype=jnp2.uint32),
                               jnp2.zeros(n, jnp2.uint32), 7)
    mask = jnp2.ones(n, bool)
    rng_p, hit_p = intersect_scene(scene, o, d, t, state, mask,
                                   exact=False, use_pallas=True)
    rng_j, hit_j = intersect_scene(scene, o, d, t, state, mask,
                                   exact=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(rng_p), np.asarray(rng_j))
    np.testing.assert_array_equal(np.asarray(hit_p.hit),
                                  np.asarray(hit_j.hit))
    h = np.asarray(hit_j.hit)
    np.testing.assert_array_equal(np.asarray(hit_p.cls)[h],
                                  np.asarray(hit_j.cls)[h])
    np.testing.assert_array_equal(np.asarray(hit_p.mat)[h],
                                  np.asarray(hit_j.mat)[h])
    np.testing.assert_allclose(np.asarray(hit_p.t)[h],
                               np.asarray(hit_j.t)[h],
                               rtol=2e-4, atol=1e-5)
    for comp in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_p.normal, comp))[h],
            np.asarray(getattr(hit_j.normal, comp))[h],
            rtol=5e-3, atol=5e-3)


def test_prim_fold_rect_tri_classes(interp_pallas):
    """Rect + triangle winners through the megakernel on a mixed scene."""
    from path_tracer_tpu.core.vec import Vec3
    from path_tracer_tpu.engine.intersect import intersect_scene
    from path_tracer_tpu.scene.builder import SceneBuilder
    from path_tracer_tpu.core import rng as rng_mod2
    sb = SceneBuilder()
    m = sb.lambertian((0.5, 0.5, 0.5))
    sb.add_xy_rect(-1, 1, -1, 1, -2.0, m)                 # closest at z=-2
    sb.add_triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3), m)
    sb.add_box((-0.5, -0.5, -5.0), (0.5, 0.5, -4.0), m)
    sb.add_sphere((0, 0, -8), 1.0, m)
    scene = sb.build()
    n = 1024
    o = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    # half the rays dodge the rect/tri by an x offset
    xoff = jnp.where(jnp.arange(n) % 2 == 0, 0.0, 3.0)
    d = Vec3(xoff * 0.0, jnp.zeros(n), -jnp.ones(n))
    o = Vec3(o.x + xoff, o.y, o.z)
    t = jnp.zeros(n)
    state = rng_mod2.seed_perf(jnp.arange(n, dtype=jnp.uint32),
                               jnp.zeros(n, jnp.uint32), 0)
    mask = jnp.ones(n, bool)
    for up in (True, False):
        rng2, hit = intersect_scene(scene, o, d, t, state, mask,
                                    exact=False, use_pallas=up)
        hits = np.asarray(hit.hit)
        ts = np.asarray(hit.t)
        # straight rays hit the rect at t=2
        assert hits[::2].all()
        np.testing.assert_allclose(ts[::2], 2.0, atol=1e-5)
        # offset rays miss everything
        assert not hits[1::2].any()
