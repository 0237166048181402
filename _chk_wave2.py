import numpy as np
import jax
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.engine.integrator import render_wavefront
from path_tracer_tpu.engine.wave import render_wave

scene, cam = build_final_scene(1.5)
W, H, SPP, D = 48, 32, 4, 8
ref = np.asarray(render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False))
img = np.asarray(render_wave(scene, cam, W, H, SPP, max_depth=D))
d = np.abs(ref - img).max(axis=-1)
ys, xs = np.nonzero(d > 1e-3)
print("bad pixels (x, y, diff, ref_rgb, img_rgb):")
for y, x in list(zip(ys, xs))[:30]:
    print(f"  ({x:3d},{y:3d}) d={d[y,x]:.4f} ref={ref[y,x].round(3)} img={img[y,x].round(3)}")
# seed variation: knife-edge diffs move with seed; systematic ones persist per-pixel
img2 = np.asarray(render_wave(scene, cam, W, H, SPP, max_depth=D, seed=7))
ref2 = np.asarray(render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False, seed=7))
d2 = np.abs(ref2 - img2).max(axis=-1)
both = (d > 1e-3) & (d2 > 1e-3)
print("bad seed0:", int((d>1e-3).sum()), "bad seed7:", int((d2>1e-3).sum()),
      "bad both:", int(both.sum()))
ys, xs = np.nonzero(both)
for y, x in list(zip(ys, xs))[:12]:
    print(f"  persistent ({x:3d},{y:3d}) d0={d[y,x]:.4f} d7={d2[y,x]:.4f}")
