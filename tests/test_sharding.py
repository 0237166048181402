"""Multi-device tests on the virtual 8-device CPU mesh: sharded forward
render equivalence, spp-axis psum, and the distributed training step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_tpu.engine.integrator import render_perf
from path_tracer_tpu.parallel.mesh import (make_mesh, make_train_step,
                                           render_sharded,
                                           scene_camera_params)
from path_tracer_tpu.scene.presets import THREE_SPHERES


@pytest.fixture(scope="module")
def scene_cam():
    return THREE_SPHERES.build()


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"


def test_sharded_render_matches_single_device(scene_cam):
    scene, cam = scene_cam
    w, h, spp, depth = 32, 8, 2, 4
    mesh = make_mesh(n_tiles=4, n_spp=1)
    img_sharded = np.asarray(render_sharded(scene, cam, w, h, spp, mesh,
                                            max_depth=depth))
    mesh1 = make_mesh(n_tiles=1, n_spp=1, devices=jax.devices()[:1])
    img_single = np.asarray(render_sharded(scene, cam, w, h, spp, mesh1,
                                           max_depth=depth))
    np.testing.assert_allclose(img_sharded, img_single, rtol=1e-5, atol=1e-6)


def test_spp_axis_psum(scene_cam):
    """Splitting samples across the spp axis must agree with the same total
    sample set on one device (identical counter-seeded streams)."""
    scene, cam = scene_cam
    w, h, spp, depth = 16, 8, 4, 4
    mesh22 = make_mesh(n_tiles=2, n_spp=2)
    img22 = np.asarray(render_sharded(scene, cam, w, h, spp, mesh22,
                                      max_depth=depth))
    mesh1 = make_mesh(n_tiles=1, n_spp=1, devices=jax.devices()[:1])
    img1 = np.asarray(render_sharded(scene, cam, w, h, spp, mesh1,
                                     max_depth=depth))
    np.testing.assert_allclose(img22, img1, rtol=1e-5, atol=1e-6)


def test_sharded_matches_render_perf_statistically(scene_cam):
    scene, cam = scene_cam
    w, h, spp, depth = 32, 16, 32, 6
    mesh = make_mesh(n_tiles=8, n_spp=1)
    a = np.asarray(render_sharded(scene, cam, w, h, spp, mesh,
                                  max_depth=depth))
    b = np.asarray(render_perf(scene, cam, w, h, spp, max_depth=depth))
    assert np.abs(a - b).mean() < 0.05


def test_train_step_runs_and_reduces_loss(scene_cam):
    scene, cam = scene_cam
    w, h, depth = 16, 8, 3
    mesh = make_mesh(n_tiles=4, n_spp=2)
    target = render_sharded(scene, cam, w, h, 4, mesh, max_depth=depth)
    target = target.reshape(w * h, 3)

    params, (s_scene, s_cam) = scene_camera_params(scene, cam)
    # perturb the metal albedo so there is something to learn
    mat_color = params[0].materials.color
    perturbed = params[0]._replace(
        materials=params[0].materials._replace(
            color=type(mat_color)(mat_color.x + 0.2, mat_color.y,
                                  mat_color.z)))
    params = (perturbed, params[1])

    # optimize only the continuous material colors: geometry gradients are
    # interior-only (no silhouette terms) and would wander at this spp.
    def only_material_colors(grads):
        scene_g, cam_g = grads
        zeros = jax.tree_util.tree_map(
            lambda g: jnp.zeros_like(g) if g is not None else None,
            grads, is_leaf=lambda x: x is None)
        zs, zc = zeros
        zs = zs._replace(materials=zs.materials._replace(
            color=scene_g.materials.color))
        return (zs, zc)

    step = make_train_step(s_scene, s_cam, w, h, 2, depth, mesh, lr=0.5,
                           grad_filter=only_material_colors)
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    losses = []
    for _ in range(5):
        params, loss = step(params, target, pix)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_multihost_glue_single_process():
    """bring_up is a no-op single-process; global_mesh covers all devices;
    sharded render through it matches render_perf exactly."""
    import jax
    from path_tracer_tpu.parallel.multihost import (assemble_image,
                                                    bring_up, global_mesh)
    from path_tracer_tpu.parallel.mesh import render_sharded
    from path_tracer_tpu.engine.integrator import render_perf
    from path_tracer_tpu.scene.presets import THREE_SPHERES

    bring_up()
    mesh = global_mesh(n_spp=2)
    assert mesh.shape["tiles"] * mesh.shape["spp"] == len(jax.devices())
    scene, cam = THREE_SPHERES.build()
    img = render_sharded(scene, cam, 64, 32, 4, mesh, max_depth=4)
    ref = np.asarray(render_perf(scene, cam, 64, 32, 4, max_depth=4))
    np.testing.assert_allclose(assemble_image(img), ref, atol=2e-6)
