"""Full-image golden tests: the vectorized parity-mode renderer vs the
scalar oracle at identical RNG streams, plus determinism and perf/parity
statistical agreement.

Transcendental functions (sin/cos/log/atan2) differ between XLA and libm by
ulps, and Monte-Carlo branch flips amplify single-ulp differences into fully
divergent pixels — so image comparisons are *robust*: at least 97% of pixels
must match tightly and the mean absolute error must stay small.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from path_tracer_tpu.engine.integrator import render_parity, render_perf
from path_tracer_tpu.scene.builder import SceneBuilder
from path_tracer_tpu.core.camera import Camera


def _lambertian_scene():
    """Spheres + lambertian only: the scatter path is transcendental-free
    (unit_vec uses just sqrt), so parity should be near-bit-exact."""
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.8, 0.8, 0.0)))
    sb.add_sphere((0, 0, -1), 0.5, sb.lambertian((0.1, 0.2, 0.5)))
    sb.add_sphere((-1, 0, -1), 0.5, sb.lambertian((0.7, 0.3, 0.3)))
    cam = Camera.create((0, 0, 0.5), (0, 0, -1), (0, 1, 0), 70.0,
                        2.0, 0.0, 1.5)
    return sb.build(), cam


def _full_feature_scene():
    sb = SceneBuilder()
    checker = sb.checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian(checker))
    sb.add_sphere((0, 0, -1.2), 0.5, sb.lambertian((0.1, 0.2, 0.5)))
    sb.add_sphere((-1.05, 0, -1.2), 0.5, sb.dielectric(1.5, (1.0, 0.9, 0.9)))
    sb.add_sphere((1.05, 0, -1.2), 0.5, sb.metal((0.8, 0.6, 0.2), 0.15))
    sb.add_moving_sphere((0, 0.9, -1.2), (0, 1.1, -1.2), 0.0, 1.0, 0.2,
                         sb.lambertian((0.9, 0.3, 0.3)))
    sb.add_xy_rect(-0.5, 0.5, 0.1, 0.7, -2.2, sb.light((4, 4, 4)))
    sb.add_triangle((-2, 0, -2), (-1.2, 0, -2), (-1.6, 0.9, -2),
                    sb.lambertian((0.3, 0.8, 0.3)))
    sb.add_box((0.6, -0.5, -2.0), (1.0, 0.1, -1.7),
               sb.metal((0.7, 0.6, 0.5), 0.3))
    sb.add_constant_medium(("sphere", (-0.3, 0.2, -0.7), 0.25), 3.0,
                           (1, 1, 1))
    img = np.zeros((4, 4, 3), np.uint8)
    img[::2, ::2] = [255, 0, 0]
    img[1::2, 1::2] = [0, 0, 255]
    tex = sb.image_texture(img)
    sb.add_sphere((0.55, 0.55, -1.0), 0.18, sb.lambertian(tex))
    cam = Camera.create((0, 0.4, 1.2), (0, 0, -1), (0, 1, 0), 55.0,
                        1.5, 0.04, 2.2, 0.0, 1.0)
    return sb.build(), cam


def _robust_compare(got, want, frac=0.97, pixel_tol=2e-3, mean_tol=2e-3):
    got = np.asarray(got, np.float32)
    diff = np.abs(got - want).max(axis=-1)
    close = (diff <= pixel_tol).mean()
    mae = np.abs(got - want).mean()
    assert close >= frac, f"only {close:.3f} of pixels within {pixel_tol}"
    assert mae <= mean_tol, f"mean abs err {mae}"


def test_parity_lambertian_vs_oracle():
    scene, cam = _lambertian_scene()
    w, h, spp, depth = 24, 12, 3, 6
    want = oracle.render(scene, cam, w, h, spp, depth)
    got = render_parity(scene, cam, w, h, spp, depth)
    _robust_compare(got, want, frac=0.97, pixel_tol=1e-4, mean_tol=1e-4)


def test_parity_full_features_vs_oracle():
    scene, cam = _full_feature_scene()
    w, h, spp, depth = 16, 12, 3, 8
    want = oracle.render(scene, cam, w, h, spp, depth)
    got = render_parity(scene, cam, w, h, spp, depth)
    _robust_compare(got, want, frac=0.93, pixel_tol=2e-3, mean_tol=4e-3)


def test_parity_deterministic():
    scene, cam = _lambertian_scene()
    a = np.asarray(render_parity(scene, cam, 16, 8, 2, 4))
    b = np.asarray(render_parity(scene, cam, 16, 8, 2, 4))
    np.testing.assert_array_equal(a, b)


def test_perf_mode_statistically_agrees():
    scene, cam = _lambertian_scene()
    w, h = 32, 16
    a = np.asarray(render_parity(scene, cam, w, h, 64, 6))
    b = np.asarray(render_perf(scene, cam, w, h, 64, 6))
    # independent streams, same target distribution: MC error ~ 1/sqrt(64)
    assert np.abs(a - b).mean() < 0.03
    assert np.abs(a.mean() - b.mean()) < 0.01


def test_attenuate_emission_mode():
    """Reference mode returns emission unattenuated (render.hpp:73);
    physical mode scales it by throughput — must differ after a bounce."""
    sb = SceneBuilder()
    sb.add_sphere((0, -100.5, -1), 100.0, sb.lambertian((0.2, 0.2, 0.2)))
    sb.add_sphere((0, 0.3, -1), 0.3, sb.light((5, 5, 5)))
    cam = Camera.create((0, 0, 1), (0, 0, -1), (0, 1, 0), 60.0, 2.0, 0.0, 2.0)
    scene = sb.build()
    ref = np.asarray(render_parity(scene, cam, 16, 8, 8, 6,
                                   attenuate_emission=False))
    phys = np.asarray(render_parity(scene, cam, 16, 8, 8, 6,
                                    attenuate_emission=True))
    assert ref.mean() > phys.mean()  # attenuation can only dim emission


def test_parity_banding_bitexact():
    """render_parity(band_rows=k) must equal the full-frame parity render
    bit-for-bit: streams are per-pixel, banding only changes batching.
    (The banded path exists because a full 800x480 frame OOMs a v5e
    worker — engine/integrator.py render_parity docstring.)"""
    import numpy as np
    from path_tracer_tpu.engine.integrator import render_parity
    from path_tracer_tpu.scene.presets import THREE_SPHERES
    scene, cam = THREE_SPHERES.build()
    full = np.asarray(render_parity(scene, cam, 24, 12, 2, max_depth=4))
    banded = np.asarray(render_parity(scene, cam, 24, 12, 2, max_depth=4,
                                      band_rows=5))
    np.testing.assert_array_equal(full, banded)
