"""Queue-driven record-and-replay VJP (diff.queued_vjp): the replay must
reconstruct the recorded forward's framebuffer, and the recorder's static
schedule knobs (variable chunking, stage widths) must not change radiance.

Agreement is an ENVELOPE, not equality: the pallas kernel and the XLA
replay differ by ulps, and a 1-ulp hit-point difference flips discrete
selections (checker cell parity, Schlick threshold) on knife-edge paths —
the repo-wide chaos note (docs/PERF_NOTES.md).  Measured on the final
scene: ~0.2% of pixels, globally compensating.  Reference semantics:
render.hpp:25-106, texture.hpp:42-49.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.diff import params as P
from path_tracer_tpu.diff.queued_vjp import (record_forward_q,
                                             render_grad_fb, replay_fb,
                                             rec_segments, static_attr_rows)
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 40, 30, 2, 6
ZERO = jnp.float32(0.0)


@pytest.fixture(scope="module")
def scene_cam():
    return build_final_scene(W / H)


def _record(scene, cam, **kw):
    f = render_grad_fb(W, H, W * H, SPP, max_depth=DEPTH, attenuate=True,
                       **kw)
    cfg = f.cfg
    rcfg = {k: v for k, v in cfg.items() if k not in ("width", "height")}
    fb, rec, ok = jax.jit(lambda s, c: record_forward_q(
        s, c, W, H, ZERO, ZERO, **rcfg))(scene, cam)
    return cfg, fb, rec, ok


def test_replay_fb_matches_recorded_fb(scene_cam):
    scene, cam = scene_cam
    cfg, fb, rec, ok = _record(scene, cam)
    assert bool(ok)
    fb_r = jax.jit(lambda s, c: replay_fb(
        s, c, rec, ZERO, width=W, height=H, npx=W * H, max_depth=DEPTH,
        attenuate=True, t_min=1e-3, seed=0,
        window=cfg["window"]))(scene, cam)
    fb = np.asarray(fb)
    fb_r = np.asarray(fb_r)
    err = np.abs(fb - fb_r).max(axis=1)
    outliers = (err > 1e-4).mean()
    assert outliers < 0.01, f"replay fb outlier fraction {outliers}"
    rel_sum = abs(fb_r.sum() - fb.sum()) / max(abs(fb.sum()), 1e-9)
    assert rel_sum < 1e-3, rel_sum


def test_variable_chunking_preserves_radiance(scene_cam):
    """tail_pix splits late chunks into singles; streams are keyed on
    (pixel, sample) so per-pixel sums only move by deposit reassociation
    + knife-edge flips (envelope)."""
    scene, cam = scene_cam
    _, fb0, rec0, ok0 = _record(scene, cam, tail_pix=0)
    _, fb1, rec1, ok1 = _record(scene, cam, tail_pix=W * H // 3)
    assert bool(ok0) and bool(ok1)
    # identical sample population either way
    assert float(rec_segments(rec0)) > 0
    fb0 = np.asarray(fb0)
    fb1 = np.asarray(fb1)
    err = np.abs(fb0 - fb1).max(axis=1)
    assert (err > 1e-4).mean() < 0.01
    assert abs(fb1.sum() - fb0.sum()) / max(abs(fb0.sum()), 1e-9) < 1e-3


def test_attr_rows_hint_is_value_neutral(scene_cam):
    """The static R hint only resizes the fetch table; gradients must be
    identical (the extra rows are padding)."""
    scene, cam = scene_cam
    ar = static_attr_rows(scene)
    sc_p, sc_s = P.partition(scene)
    cm_p, cm_s = P.partition(cam)

    def gnorm(attr_rows):
        f = render_grad_fb(W, H, W * H, SPP, max_depth=DEPTH,
                           attenuate=True, attr_rows=attr_rows)

        def loss(sp, cp):
            img = f(P.combine(sp, sc_s), P.combine(cp, cm_s), ZERO, ZERO)
            return jnp.mean(img)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(sc_p, cm_p)

    g_hint = gnorm(ar)
    g_none = gnorm(None)
    for a, b in zip(jax.tree_util.tree_leaves(g_hint),
                    jax.tree_util.tree_leaves(g_none)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
