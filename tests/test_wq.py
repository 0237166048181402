"""Work-queue drivers (engine.wq: windowed + legacy one-bounce) anchored to
the jnp ground-truth integrator — the missing link in the equivalence chain
(wavefront <- oracle; wq <- wavefront).

All engines consume identical per-(pixel, sample) streams
(core.rng.seed_perf), so images agree up to f32 reassociation except a
bounded fraction of knife-edge pixels where reassociation flips a discrete
branch (dielectric Fresnel draw, checker sign, shadow window) or the
kernel's minimax atan2 picks an adjacent texel — the same envelope
tests/test_wave.py pins for the wave renderer.

Reference semantics being cross-checked: the render.hpp:25-106 integrator
(sample loop, bounce loop, sky, emission quirk) and the deposit accounting
of render.hpp:102-105."""
import numpy as np
import pytest

from path_tracer_tpu.engine.integrator import render_wavefront
from path_tracer_tpu.engine.wq import pick_chunk, render_wq
from path_tracer_tpu.scene.presets import (CORNELL_BOX, THREE_SPHERES,
                                           build_final_scene)


def _anchor(scene, cam, w, h, spp, depth, tol=2e-4, outlier_frac=0.0,
            windows=(1, 3), **kw):
    ref = np.asarray(render_wavefront(scene, cam, w, h, spp,
                                      max_depth=depth, **kw))
    for window in windows:
        img = np.asarray(render_wq(scene, cam, w, h, spp, max_depth=depth,
                                   tile_rows=4, window=window, **kw))
        assert np.isfinite(img).all()
        d = np.abs(img - ref).max(axis=-1)
        frac_bad = float((d > tol).mean())
        assert frac_bad <= outlier_frac, (
            f"window={window}: {frac_bad:.4f} of pixels deviate > {tol} "
            f"(allowed {outlier_frac}); max diff {d.max():.4f}")


def test_pick_chunk():
    assert pick_chunk(80) == 10
    assert pick_chunk(100) == 10
    assert pick_chunk(500) == 10
    assert pick_chunk(2) == 2
    assert pick_chunk(12) == 6     # largest divisor <= cap
    assert pick_chunk(7) == 7      # prime <= cap
    assert pick_chunk(11) == 1     # prime > cap
    assert pick_chunk(1) == 1


def test_wq_anchor_three_spheres():
    scene, cam = THREE_SPHERES.build()
    _anchor(scene, cam, 32, 16, 4, 6)


def test_wq_anchor_cornell_emissive():
    """Rects + boxes + emissive light: the unattenuated-emission quirk
    (render.hpp:73) must survive the queue drivers' deposit accounting."""
    scene, cam = CORNELL_BOX.build()
    _anchor(scene, cam, 16, 16, 4, 6)


def test_wq_anchor_final_scene():
    """All classes: media, image textures (the windowed driver's pause
    path), moving spheres, dielectric."""
    scene, cam = build_final_scene(1.5)
    _anchor(scene, cam, 24, 16, 4, 8, tol=5e-3, outlier_frac=0.03)


def test_wq_windowed_drain_stage_compaction():
    """A frame big enough for n_tiles=2 (48x32, tile_rows=8 -> 2048 lanes)
    exercises the drain-stage schedule: one compact() to a 1-tile grid,
    flush_acc at the stage boundary, and narrowed drain bounces.  The
    windowed result must match the legacy one-bounce driver (which never
    compacts) within the knife-edge envelope — a compact() regression
    (dropped live lane, unflushed acc, bad permutation) shifts whole
    pixels and fails loudly.  (Advisor r3 medium finding: previously no
    test triggered stage_tiles != [].)"""
    scene, cam = build_final_scene(1.5)
    ref, segs1, _, _ = render_wq(scene, cam, 48, 32, 1, max_depth=6,
                                 tile_rows=8, window=1,
                                 return_stats=True)
    img, segsw, iters_w, lsw = render_wq(scene, cam, 48, 32, 1,
                                         max_depth=6, tile_rows=8,
                                         window=2, return_stats=True)
    ref = np.asarray(ref)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    d = np.abs(img - ref).max(axis=-1)
    frac_bad = float((d > 5e-3).mean())
    assert frac_bad <= 0.03, (frac_bad, float(d.max()))
    assert abs(float(segs1) - float(segsw)) <= 0.002 * float(segs1)
    # the drain ran on a NARROWED grid: dispatched lane-steps are fewer
    # than iterations x full width (2048 lanes here)
    assert float(lsw) < float(iters_w) * 2048.0


def test_wq_windowed_matches_legacy_on_segments():
    """Windowed and one-bounce drivers trace the SAME (pixel, sample)
    work, so traced-segment counts agree to within the knife-edge
    envelope.  (Not exactly: a chaotic path can flip a discrete branch
    between the two drivers even with bitwise-identical per-sample
    streams — on the CPU test backend XLA's vector-body vs scalar-tail
    codegen differs by an ulp depending on batch layout, demonstrated by
    the jnp renderer itself disagreeing with its own per-sample traces on
    such paths.  A flipped path changes its own length only.)"""
    scene, cam = build_final_scene(1.5)
    _, segs1, _, _ = render_wq(scene, cam, 16, 16, 2, max_depth=6,
                               tile_rows=4, window=1, return_stats=True)
    _, segsw, _, _ = render_wq(scene, cam, 16, 16, 2, max_depth=6,
                               tile_rows=4, window=4, return_stats=True)
    assert abs(float(segs1) - float(segsw)) <= 0.002 * float(segs1)


@pytest.mark.slow
def test_wq_windowed_matches_legacy_on_segments_full():
    scene, cam = build_final_scene(1.5)
    _, segs1, _, _ = render_wq(scene, cam, 24, 16, 4, max_depth=8,
                               tile_rows=8, window=1, return_stats=True)
    _, segsw, _, _ = render_wq(scene, cam, 24, 16, 4, max_depth=8,
                               tile_rows=8, window=4, return_stats=True)
    assert abs(float(segs1) - float(segsw)) <= 0.002 * float(segs1)
