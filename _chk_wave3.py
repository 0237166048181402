import numpy as np
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.engine.integrator import render_wavefront
from path_tracer_tpu.engine.wave import render_wave

scene, cam = build_final_scene(1.5)
W, H, SPP, D = 48, 32, 4, 8
ref0 = np.asarray(render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False, seed=0))
ref7 = np.asarray(render_wavefront(scene, cam, W, H, SPP, max_depth=D, use_pallas=False, seed=7))
img0 = np.asarray(render_wave(scene, cam, W, H, SPP, max_depth=D, seed=0))
img7 = np.asarray(render_wave(scene, cam, W, H, SPP, max_depth=D, seed=7))
print("ref0 vs ref7 differ pixels:", int((np.abs(ref0-ref7).max(-1) > 1e-6).sum()))
print("img0 vs img7 differ pixels:", int((np.abs(img0-img7).max(-1) > 1e-6).sum()))
d0 = np.abs(ref0-img0).max(-1); d7 = np.abs(ref7-img7).max(-1)
print("bad0:", int((d0>1e-3).sum()), "bad7:", int((d7>1e-3).sum()),
      "same diff:", int(((d0 == d7) & (d0 > 1e-3)).sum()))
y, x = np.nonzero(d0 > 1e-2)
if len(y):
    yy, xx = y[0], x[0]
    print("pixel", xx, yy, "ref0", ref0[yy,xx], "img0", img0[yy,xx],
          "ref7", ref7[yy,xx], "img7", img7[yy,xx])
