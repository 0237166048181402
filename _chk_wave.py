import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import numpy as np
import jax
from path_tracer_tpu.scene.presets import THREE_SPHERES, build_final_scene
from path_tracer_tpu.engine.integrator import render_wavefront
from path_tracer_tpu.engine.wave import render_wave

scene, cam = THREE_SPHERES.build()
W, H, SPP, D = 64, 32, 4, 8
ref = render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False)
img = render_wave(scene, cam, W, H, SPP, max_depth=D)
ref, img = np.asarray(ref), np.asarray(img)
print("three_spheres: max abs diff", np.abs(ref - img).max(),
      "mean", np.abs(ref - img).mean())

scene, cam = build_final_scene(1.5)
W, H, SPP, D = 48, 32, 4, 8
ref = render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False)
img = render_wave(scene, cam, W, H, SPP, max_depth=D)
ref, img = np.asarray(ref), np.asarray(img)
d = np.abs(ref - img)
print("final: max abs diff", d.max(), "mean", d.mean(),
      "bad px", int((d.max(axis=-1) > 1e-3).sum()), "/", W*H)
