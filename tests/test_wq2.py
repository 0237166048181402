"""B-bounce in-kernel-queue renderer (engine.wq2 / ops.pallas.wq_kernel):
interpret-mode equivalence against the one-bounce work-queue renderer.

Both engines consume identical per-(pixel, sample) streams
(core.rng.seed_perf), so images must agree up to cross-engine f32
reassociation (measured <= ~3e-4 absolute on the final scene; the same
envelope separates engine.wq from the jnp path)."""
import numpy as np
import pytest

from path_tracer_tpu.engine.wq import render_wq
from path_tracer_tpu.engine.wq2 import render_wq2, pick_chunk
from path_tracer_tpu.scene.presets import (CORNELL_BOX, THREE_SPHERES,
                                           build_final_scene)

ATOL = 1e-3


def _pair(scene, cam, w, h, spp, depth, **kw):
    a = np.asarray(render_wq(scene, cam, w, h, spp, max_depth=depth,
                             tile_rows=8, **kw))
    b = np.asarray(render_wq2(scene, cam, w, h, spp, max_depth=depth,
                              tile_rows=8, **kw))
    return a, b


def test_pick_chunk():
    assert pick_chunk(80) == 16
    assert pick_chunk(100) == 10
    assert pick_chunk(500) == 10
    assert pick_chunk(7) == 7
    assert pick_chunk(13) == 13
    assert pick_chunk(17) == 1   # prime > cap
    assert pick_chunk(1) == 1


def test_wq2_three_spheres():
    scene, cam = THREE_SPHERES.build()
    a, b = _pair(scene, cam, 24, 16, 4, 6)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_wq2_cornell():
    """Rects + boxes + emissive light: exercises the emission path and the
    reference's unattenuated-emission quirk."""
    scene, cam = CORNELL_BOX.build()
    a, b = _pair(scene, cam, 16, 16, 4, 6)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_wq2_final_scene():
    """All classes: media, image textures (stall path), moving spheres."""
    scene, cam = build_final_scene(1.5)
    a, b = _pair(scene, cam, 24, 16, 4, 8)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_wq2_final_scene_attenuate():
    scene, cam = build_final_scene(1.5)
    a, b = _pair(scene, cam, 24, 16, 2, 6, attenuate_emission=True)
    np.testing.assert_allclose(a, b, atol=ATOL)


@pytest.mark.parametrize("spp", [1, 3])
def test_wq2_awkward_spp(spp):
    """spp with small/prime chunk divisors still renders correctly."""
    scene, cam = THREE_SPHERES.build()
    a, b = _pair(scene, cam, 16, 8, spp, 4)
    np.testing.assert_allclose(a, b, atol=ATOL)
