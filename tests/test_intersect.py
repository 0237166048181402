"""Vectorized intersection vs the scalar oracle on randomized rays.

Covers: static + moving spheres, all rect axes, boxes (6-rect expansion),
triangles, constant media (sphere + box boundary, incl. RNG stream
advancement), scan-order tie semantics, and front/back face handling.
"""
import numpy as np
import jax.numpy as jnp

import oracle
from path_tracer_tpu.core.vec import Vec3
from path_tracer_tpu.engine.intersect import intersect_scene
from path_tracer_tpu.scene.builder import SceneBuilder


def _mixed_scene():
    sb = SceneBuilder()
    mat = sb.lambertian((0.5, 0.5, 0.5))
    sb.add_sphere((0, 0, -3), 1.0, mat)
    sb.add_moving_sphere((2.5, 0, -3), (2.5, 1, -3), 0.0, 1.0, 0.7,
                         sb.metal((0.8, 0.8, 0.8), 0.1))
    sb.add_xy_rect(-2, -0.5, -1, 1, -4, sb.lambertian((0.9, 0.1, 0.1)))
    sb.add_xz_rect(-3, 3, -6, -1, -1.5, mat)
    sb.add_yz_rect(-1, 1, -5, -2, -3.5, sb.light((4, 4, 4)))
    sb.add_triangle((-1, -1, -2), (1, -1, -2), (0, 1.5, -2.5),
                    sb.lambertian((0.2, 0.2, 0.9)))
    sb.add_box((1.0, -1.0, -5.0), (2.0, 0.0, -4.0), mat)
    sb.add_constant_medium(("sphere", (-2.0, 0.0, -3.0), 0.8), 2.0,
                           (1.0, 1.0, 1.0))
    sb.add_constant_medium(("box", (-0.5, -0.5, -6.5), (0.5, 0.5, -5.5)),
                           1.5, (0.9, 0.9, 0.9))
    return sb.build()


def _random_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o[:, 2] += 2.0
    target = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    target[:, 2] -= 4.0
    d = (target - o).astype(np.float32)
    t = rs.uniform(0, 1, n).astype(np.float32)
    return o, d, t


def test_intersect_matches_oracle():
    scene = _mixed_scene()
    entries = oracle.scan_list(scene)
    n = 256
    o_np, d_np, t_np = _random_rays(n)
    seeds = (np.arange(n) * 2654435761 + 12345) % (2**32)
    seeds[seeds == 0] = 1

    ro = Vec3(jnp.asarray(o_np[:, 0]), jnp.asarray(o_np[:, 1]),
              jnp.asarray(o_np[:, 2]))
    rd = Vec3(jnp.asarray(d_np[:, 0]), jnp.asarray(d_np[:, 1]),
              jnp.asarray(d_np[:, 2]))
    rt = jnp.asarray(t_np)
    state = jnp.asarray(seeds, dtype=jnp.uint32)
    mask = jnp.ones(n, bool)

    state2, hit = intersect_scene(scene, ro, rd, rt, state, mask)
    state2 = np.asarray(state2)
    n_mismatch = 0
    for i in range(n):
        rng = oracle.Rng(int(seeds[i]))
        rec = oracle.HitRec()
        ok, mat_id = oracle.hit_world(scene, entries, o_np[i], d_np[i],
                                      np.float32(t_np[i]), rng, rec)
        if bool(hit.hit[i]) != ok:
            n_mismatch += 1
            continue
        # RNG stream must advance identically (media draws)
        assert int(state2[i]) == rng.s, f"ray {i}: rng stream diverged"
        if not ok:
            continue
        if not np.isclose(float(hit.t[i]), rec.t, rtol=2e-5, atol=1e-6):
            n_mismatch += 1
            continue
        assert int(hit.mat[i]) == mat_id, f"ray {i}: material mismatch"
        got_n = np.array([hit.normal.x[i], hit.normal.y[i], hit.normal.z[i]],
                         np.float32)
        np.testing.assert_allclose(got_n, rec.normal, rtol=1e-4, atol=1e-4)
        assert bool(hit.front_face[i]) == rec.front_face
        got_p = np.array([hit.p.x[i], hit.p.y[i], hit.p.z[i]], np.float32)
        np.testing.assert_allclose(got_p, rec.p, rtol=1e-4, atol=1e-4)
        if int(hit.cls[i]) in (0, 1):
            # u,v comparable only for spheres/rects; the reference leaves
            # them STALE for triangles and media (triangle.hpp:113,
            # constant_medium.hpp:72-76) so the oracle's values there are
            # garbage-by-design.
            np.testing.assert_allclose(
                [float(hit.u[i]), float(hit.v[i])], [rec.u, rec.v],
                rtol=1e-3, atol=2e-5)
    # allow a tiny number of borderline disagreements (ulp-level t ties /
    # media log() near the acceptance threshold)
    assert n_mismatch <= 2, f"{n_mismatch} mismatching rays"


def test_sphere_inside_second_root():
    """Ray origin inside a sphere must use the second quadratic root with a
    back-face (flipped) normal — sphere.hpp:88-99 + hitable.hpp:20-23."""
    sb = SceneBuilder()
    sb.add_sphere((0, 0, 0), 2.0, sb.dielectric(1.5, (1, 1, 1)))
    scene = sb.build()
    ro = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]))
    rd = Vec3(jnp.array([1.0]), jnp.array([0.0]), jnp.array([0.0]))
    _, hit = intersect_scene(scene, ro, rd, jnp.zeros(1),
                             jnp.array([7], jnp.uint32), jnp.ones(1, bool))
    assert bool(hit.hit[0])
    assert np.isclose(float(hit.t[0]), 2.0)
    assert not bool(hit.front_face[0])
    assert np.isclose(float(hit.normal.x[0]), -1.0)


def test_moving_sphere_center_lerp():
    sb = SceneBuilder()
    sb.add_moving_sphere((0, 0, -5), (4, 0, -5), 0.0, 1.0, 0.5,
                         sb.lambertian((0.5, 0.5, 0.5)))
    scene = sb.build()
    for tm, cx in [(0.0, 0.0), (0.5, 2.0), (1.0, 4.0)]:
        ro = Vec3(jnp.array([cx]), jnp.array([0.0]), jnp.array([0.0]))
        rd = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([-1.0]))
        _, hit = intersect_scene(scene, ro, rd,
                                 jnp.array([tm], jnp.float32),
                                 jnp.array([7], jnp.uint32),
                                 jnp.ones(1, bool))
        assert bool(hit.hit[0]), f"time {tm}"
        assert np.isclose(float(hit.t[0]), 4.5, atol=1e-5)


def test_box_closest_side():
    """A ray toward a box must hit the nearest side with the right normal."""
    sb = SceneBuilder()
    sb.add_box((-1, -1, -4), (1, 1, -2), sb.lambertian((0.5, 0.5, 0.5)))
    scene = sb.build()
    ro = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]))
    rd = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([-1.0]))
    _, hit = intersect_scene(scene, ro, rd, jnp.zeros(1),
                             jnp.array([7], jnp.uint32), jnp.ones(1, bool))
    assert bool(hit.hit[0])
    assert np.isclose(float(hit.t[0]), 2.0)
    np.testing.assert_allclose(
        [float(hit.normal.x[0]), float(hit.normal.y[0]),
         float(hit.normal.z[0])], [0, 0, 1])


def test_medium_consumes_rng_only_when_boundary_hit():
    sb = SceneBuilder()
    sb.add_constant_medium(("sphere", (0, 0, -3), 1.0), 5.0, (1, 1, 1))
    scene = sb.build()
    # ray A passes through the boundary, ray B misses entirely
    ro = Vec3(jnp.array([0.0, 0.0]), jnp.array([0.0, 5.0]),
              jnp.array([0.0, 0.0]))
    rd = Vec3(jnp.array([0.0, 0.0]), jnp.array([0.0, 0.0]),
              jnp.array([-1.0, -1.0]))
    s0 = jnp.array([123, 123], jnp.uint32)
    s1, hit = intersect_scene(scene, ro, rd, jnp.zeros(2), s0,
                              jnp.ones(2, bool))
    assert int(s1[0]) != 123      # drew the log() uniform
    assert int(s1[1]) == 123      # no boundary hit -> no draw
    assert not bool(hit.hit[1])


def test_empty_scene_misses():
    sb = SceneBuilder()
    scene = sb.build()
    ro = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]))
    rd = Vec3(jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    _, hit = intersect_scene(scene, ro, rd, jnp.zeros(1),
                             jnp.array([7], jnp.uint32), jnp.ones(1, bool))
    assert not bool(hit.hit[0])


def test_badouel_matches_moller_trumbore():
    """The two compile-time triangle strategies (triangle.hpp:14-100) agree
    away from edge-epsilon regions."""
    from path_tracer_tpu.engine.intersect import (triangle_t_matrix,
                                                  triangle_t_matrix_badouel)
    from path_tracer_tpu.scene.builder import SceneBuilder
    rs = np.random.RandomState(7)
    sb = SceneBuilder()
    m = sb.lambertian((0.5, 0.5, 0.5))
    for _ in range(12):
        v = rs.uniform(-2, 2, (3, 3)).astype(np.float32)
        v[:, 2] -= 4.0
        sb.add_triangle(tuple(v[0]), tuple(v[1]), tuple(v[2]), m)
    scene = sb.build()
    n = 512
    o = rs.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    ro = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    rd = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    t_mt = np.asarray(triangle_t_matrix(scene.triangles, ro, rd,
                                        jnp.float32(1e-3), jnp.inf))
    t_bd = np.asarray(triangle_t_matrix_badouel(scene.triangles, ro, rd,
                                                jnp.float32(1e-3), jnp.inf))
    hit_mt = t_mt < 1e30
    hit_bd = t_bd < 1e30
    # agreement on >99% of (ray, tri) pairs; disagreements only near edges
    agree = hit_mt == hit_bd
    assert agree.mean() > 0.99
    both = hit_mt & hit_bd
    np.testing.assert_allclose(t_mt[both], t_bd[both], rtol=5e-4, atol=1e-4)
