"""Unit tests for core math + RNG + camera against closed form and the
scalar oracle (bit-exactness where only arithmetic/sqrt is involved)."""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from path_tracer_tpu.core import rng as R
from path_tracer_tpu.core.camera import Camera
from path_tracer_tpu.core.vec import (Vec3, cross, dot, length, reflect,
                                      refract, unit_vector)


def test_xorshift_stream_matches_oracle():
    seeds = [1, 2463534242, 12345, 0xDEADBEEF]
    for seed in seeds:
        o = oracle.Rng(seed)
        expect = [o._next() for _ in range(64)]
        s = jnp.full((1,), seed, jnp.uint32)
        got = []
        for _ in range(64):
            s = R.xs32_step(s)
            got.append(int(s[0]))
        assert got == expect


def test_xorshift_zero_sticks():
    # state 0 is a fixed point (pixel 0's parity stream) — reference quirk.
    s = jnp.zeros((1,), jnp.uint32)
    s = R.xs32_step(s)
    assert int(s[0]) == 0


def test_f01_matches_oracle_bitexact():
    o = oracle.Rng(777)
    s = jnp.full((1,), 777, jnp.uint32)
    for _ in range(100):
        expect = o.f01()
        s, f = R.next_f01(s)
        assert np.float32(f[0]) == expect


def test_unit_vec_matches_oracle():
    # arithmetic + sqrt only, but XLA may contract a*a - b*b into FMA —
    # expect agreement to ~1 ulp.
    o = oracle.Rng(31337)
    s = jnp.full((1,), 31337, jnp.uint32)
    for _ in range(50):
        ev = o.unit_vec()
        s, v = R.next_unit_vec(s)
        got = np.array([v.x[0], v.y[0], v.z[0]], np.float32)
        np.testing.assert_allclose(got, ev, atol=1e-6)


def test_in_unit_disk_matches_oracle():
    o = oracle.Rng(9)
    s = jnp.full((1,), 9, jnp.uint32)
    for _ in range(50):
        ev = o.in_unit_disk()
        s, v = R.next_in_unit_disk(s)
        got = np.array([v.x[0], v.y[0], v.z[0]], np.float32)
        np.testing.assert_allclose(got, ev, atol=1e-6)


def test_in_unit_ball_matches_oracle_tolerance():
    # ball uses sin/cos — XLA approximations differ from libm by ulps.
    o = oracle.Rng(5150)
    s = jnp.full((1,), 5150, jnp.uint32)
    for _ in range(50):
        ev = o.in_unit_ball()
        s, v = R.next_in_unit_ball(s)
        got = np.array([v.x[0], v.y[0], v.z[0]], np.float32)
        np.testing.assert_allclose(got, ev, atol=1e-6)


def test_masked_advance_freezes_state():
    s = jnp.array([1, 2, 3, 4], jnp.uint32)
    mask = jnp.array([True, False, True, False])
    s2, _ = R.next_f01(s, mask)
    assert int(s2[1]) == 2 and int(s2[3]) == 4
    assert int(s2[0]) != 1 and int(s2[2]) != 3


def test_seed_perf_never_zero_and_decorrelated():
    pix = jnp.arange(1024, dtype=jnp.uint32)
    samp = jnp.zeros(1024, jnp.uint32)
    seeds = np.asarray(R.seed_perf(pix, samp))
    assert (seeds != 0).all()
    assert len(np.unique(seeds)) == 1024


def test_vec_ops_closed_form():
    a = Vec3(jnp.array([1.0]), jnp.array([2.0]), jnp.array([3.0]))
    b = Vec3(jnp.array([4.0]), jnp.array([-5.0]), jnp.array([6.0]))
    assert np.isclose(float(dot(a, b)[0]), 1 * 4 + 2 * -5 + 3 * 6)
    c = cross(a, b)
    np.testing.assert_allclose(
        [float(c.x[0]), float(c.y[0]), float(c.z[0])],
        np.cross([1, 2, 3], [4, -5, 6]).astype(np.float32))
    n = Vec3(jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    r = reflect(a, n)
    np.testing.assert_allclose(
        [float(r.x[0]), float(r.y[0]), float(r.z[0])], [1.0, -2.0, 3.0])
    u = unit_vector(a)
    assert np.isclose(float(length(u)[0]), 1.0, atol=1e-6)


def test_refract_snell():
    # straight-through at normal incidence
    uv = Vec3(jnp.array([0.0]), jnp.array([-1.0]), jnp.array([0.0]))
    n = Vec3(jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    r = refract(uv, n, jnp.float32(1.5))
    np.testing.assert_allclose(
        [float(r.x[0]), float(r.y[0]), float(r.z[0])], [0.0, -1.0, 0.0],
        atol=1e-6)
    # oblique: sin(theta_t) = ratio * sin(theta_i)
    d = Vec3(jnp.array([0.6]), jnp.array([-0.8]), jnp.array([0.0]))
    r = refract(d, n, jnp.float32(0.5))
    sin_t = float(r.x[0]) / float(length(r)[0])
    assert np.isclose(sin_t, 0.5 * 0.6, atol=1e-6)


def test_camera_get_ray_matches_oracle():
    cam = Camera.create((13, 3, 3), (0, -1, 0), (0, 1, 0), 40.0,
                        800.0 / 480.0, 0.04, 13.60147, 0.0, 1.0)
    cnp = oracle._camera_np(cam)
    o = oracle.Rng(4242)
    s = jnp.full((1,), 4242, jnp.uint32)
    for i in range(20):
        u = np.float32(0.1 + 0.04 * i)
        v = np.float32(0.9 - 0.04 * i)
        eo, ed, et = oracle._get_ray(cnp, u, v, o)
        s, go, gd, gt = cam.get_ray(jnp.full((1,), u), jnp.full((1,), v), s)
        np.testing.assert_allclose(
            np.array([go.x[0], go.y[0], go.z[0]], np.float32), eo, atol=1e-6)
        np.testing.assert_allclose(
            np.array([gd.x[0], gd.y[0], gd.z[0]], np.float32), ed,
            rtol=1e-6, atol=1e-6)
        assert abs(np.float32(gt[0]) - et) < 1e-6
