"""App-layer tests: CLI, config validation, checkpoint/resume, profiling."""
import json
import os
import shutil

import numpy as np
import pytest

from path_tracer_tpu.config import RenderConfig
from path_tracer_tpu.engine.checkpoint import (load_checkpoint,
                                               render_checkpointed)
from path_tracer_tpu.engine.integrator import render_perf
from path_tracer_tpu.scene.presets import THREE_SPHERES
from path_tracer_tpu.utils.profiling import PhaseTimer


def test_config_presets_and_validation():
    cfg = RenderConfig.for_preset("three_spheres")
    assert (cfg.width, cfg.height, cfg.spp, cfg.max_depth) == (200, 100,
                                                               10, 8)
    cfg2 = RenderConfig.for_preset("cornell_box", spp=7, renderer="parity")
    assert cfg2.spp == 7 and cfg2.renderer == "parity"
    with pytest.raises(ValueError):
        RenderConfig(scene="nope").validate()
    with pytest.raises(ValueError):
        RenderConfig(renderer="cuda").validate()
    with pytest.raises(ValueError):
        RenderConfig(spp=0).validate()


def test_every_cli_renderer_choice_validates():
    """Every --renderer argparse choice must pass RenderConfig.validate
    (round-2 advisor: 'wq2' was offered by the CLI but rejected by
    validate, crashing before rendering)."""
    from path_tracer_tpu.cli import _build_parser
    parser = _build_parser()
    render_sub = None
    for action in parser._subparsers._group_actions:
        render_sub = action.choices["render"]
    choices = None
    for action in render_sub._actions:
        if "--renderer" in getattr(action, "option_strings", ()):
            choices = list(action.choices)
    assert choices, "render subcommand must expose --renderer choices"
    for ch in choices:
        RenderConfig(renderer=ch).validate()  # must not raise


def test_cli_info(capsys):
    from path_tracer_tpu.cli import main
    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert "final_scene" in info["presets"]
    assert info["presets"]["final_scene"]["spp"] == 500


def test_cli_render_writes_png(tmp_path):
    from path_tracer_tpu.cli import main
    out = str(tmp_path / "t.png")
    rc = main(["render", "--scene", "three_spheres", "--width", "64",
               "--height", "32", "--spp", "2", "--max-depth", "3",
               "--renderer", "perf", "-o", out])
    assert rc == 0 and os.path.exists(out)
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 64, 3)
    assert img.max() > 0


def test_checkpoint_resume_bitexact_jnp(tmp_path):
    scene, cam = THREE_SPHERES.build()
    w, h, spp, depth = 32, 16, 6, 4
    ref = np.asarray(render_perf(scene, cam, w, h, spp, max_depth=depth))
    d = str(tmp_path / "ckpt")

    # partial run to spp=2, then resume to full
    render_checkpointed(scene, cam, w, h, 2, depth, ckpt_dir=d,
                        checkpoint_every=1, scene_name="three_spheres",
                        renderer="jnp")
    acc, done = load_checkpoint(d, {
        "scene": "three_spheres", "width": w, "height": h,
        "max_depth": depth, "seed": 0, "t_min": 1e-3,
        "attenuate_emission": False, "renderer": "jnp"})
    assert done == 2 and acc is not None
    img = np.asarray(render_checkpointed(
        scene, cam, w, h, spp, depth, ckpt_dir=d, checkpoint_every=2,
        scene_name="three_spheres", renderer="jnp"))
    np.testing.assert_allclose(img, ref, atol=2e-6)


def test_checkpoint_resume_bitexact_wq(tmp_path):
    """The PRODUCTION path: interrupted-and-resumed work-queue render must
    equal an uninterrupted run with the same range boundaries BIT-exactly,
    and match the plain megakernel render up to range-sum reassociation."""
    from path_tracer_tpu.engine.wq import render_wq
    scene, cam = THREE_SPHERES.build()
    w, h, spp, depth = 32, 16, 6, 4
    d = str(tmp_path / "ckpt")

    render_checkpointed(scene, cam, w, h, 4, depth, ckpt_dir=d,
                        checkpoint_every=2, scene_name="three_spheres")
    acc, done = load_checkpoint(d, {
        "scene": "three_spheres", "width": w, "height": h,
        "max_depth": depth, "seed": 0, "t_min": 1e-3,
        "attenuate_emission": False, "renderer": "wq"})
    assert done == 4 and acc is not None
    resumed = np.asarray(render_checkpointed(
        scene, cam, w, h, spp, depth, ckpt_dir=d, checkpoint_every=2,
        scene_name="three_spheres"))

    unint = np.asarray(render_checkpointed(
        scene, cam, w, h, spp, depth, ckpt_dir=str(tmp_path / "c2"),
        checkpoint_every=2, scene_name="three_spheres"))
    np.testing.assert_array_equal(resumed, unint)

    full = np.asarray(render_wq(scene, cam, w, h, spp, max_depth=depth,
                                tile_rows=8))
    np.testing.assert_allclose(resumed, full, atol=2e-4)


def test_checkpoint_identity_mismatch_ignored(tmp_path):
    scene, cam = THREE_SPHERES.build()
    d = str(tmp_path / "ckpt")
    render_checkpointed(scene, cam, 32, 16, 2, 3, ckpt_dir=d,
                        checkpoint_every=1, scene_name="three_spheres")
    # different seed -> checkpoint must be rejected
    acc, done = load_checkpoint(d, {
        "scene": "three_spheres", "width": 32, "height": 16,
        "max_depth": 3, "seed": 99, "t_min": 1e-3,
        "attenuate_emission": False, "renderer": "wq"})
    assert acc is None and done == 0


def test_phase_timer_metrics():
    t = PhaseTimer()
    with t.phase("render"):
        pass
    t.add_rays(segments=2e6, samples=1e6)
    s = t.summary()
    assert "mray_per_s" in s and s["avg_path_len"] == 2.0
