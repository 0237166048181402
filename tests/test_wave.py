"""Megakernel wavefront renderer (engine/wave.py + ops/pallas/wave_bounce)
vs the jnp perf renderer — same counter-seeded RNG streams, same formulas,
so images must agree up to float reassociation.

Runs the pallas kernel in interpret mode on the CPU test backend (same code
path Mosaic compiles on TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.engine.integrator import render_wavefront
from path_tracer_tpu.engine.wave import render_wave
from path_tracer_tpu.scene.presets import (THREE_SPHERES, CORNELL_BOX,
                                           build_final_scene)


def _compare(scene, cam, w, h, spp, depth, tol, outlier_frac=0.0, **kw):
    """Images must agree except a bounded fraction of knife-edge pixels:
    float reassociation between the kernel and jnp formulas flips discrete
    branches (dielectric Fresnel draws, checker sign, shadow-window edges)
    on isolated paths, changing those pixels' low-spp estimates by O(1/spp).
    """
    ref = np.asarray(render_wavefront(scene, cam, w, h, spp, max_depth=depth,
                                      use_pallas=False))
    img = np.asarray(render_wave(scene, cam, w, h, spp, max_depth=depth,
                                 **kw))
    assert np.isfinite(img).all()
    d = np.abs(img - ref).max(axis=-1)
    frac_bad = float((d > tol).mean())
    assert frac_bad <= outlier_frac, (
        f"{frac_bad:.4f} of pixels deviate > {tol} (allowed {outlier_frac});"
        f" max diff {d.max():.4f}")


def test_wave_three_spheres():
    scene, cam = THREE_SPHERES.build()
    _compare(scene, cam, 48, 24, 3, 6, tol=2e-4)


def test_wave_final_scene():
    """All primitive classes, all materials, smoke medium, image textures."""
    scene, cam = build_final_scene(1.5)
    _compare(scene, cam, 40, 24, 3, 8, tol=5e-3, outlier_frac=0.03)


def test_wave_cornell_emissive():
    scene, cam = CORNELL_BOX.build()
    _compare(scene, cam, 32, 32, 2, 6, tol=2e-4)


def test_wave_physical_mode():
    scene, cam = CORNELL_BOX.build()
    ref = np.asarray(render_wavefront(scene, cam, 32, 32, 2, max_depth=6,
                                      attenuate_emission=True,
                                      use_pallas=False))
    img = np.asarray(render_wave(scene, cam, 32, 32, 2, max_depth=6,
                                 attenuate_emission=True))
    np.testing.assert_allclose(img, ref, atol=2e-4, rtol=0)


def test_wave_two_phase_matches_single_phase():
    """Phase-B lane reallocation must not change the estimate (streams are
    per-(pixel, sample))."""
    scene, cam = THREE_SPHERES.build()
    a = np.asarray(render_wave(scene, cam, 32, 16, 6, max_depth=6, spp_a=6))
    b = np.asarray(render_wave(scene, cam, 32, 16, 6, max_depth=6, spp_a=2,
                               lane_factor=1.5))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=0)
