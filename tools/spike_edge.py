"""Spike: edge-sampling boundary gradient vs FD on a single-sphere scene."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.core import rng as rng_mod
from path_tracer_tpu.core.camera import Camera
from path_tracer_tpu.diff.edge import sphere_silhouette_grad
from path_tracer_tpu.engine.integrator import camera_rays, trace
from path_tracer_tpu.scene.builder import SceneBuilder

W = H = 48
SPP = 32
DEPTH = 5
CAM = Camera.create((0, 0, 1), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 2.0)


def build(radius, cx=0.0):
    sb = SceneBuilder()
    sb.add_sphere((0.0, 0, -1), 0.5, sb.lambertian((0.2, 0.3, 0.6)))
    sc = sb.build()
    # make radius/cx traced
    sph = sc.spheres
    sph = sph._replace(radius=sph.radius.at[0].set(radius),
                       c0=type(sph.c0)(sph.c0.x.at[0].set(cx), sph.c0.y,
                                       sph.c0.z),
                       c1=type(sph.c1)(sph.c1.x.at[0].set(cx), sph.c1.y,
                                       sph.c1.z))
    return sc._replace(spheres=sph)


def loss(radius, cx=jnp.float32(0.0)):
    sc = build(radius, cx)
    n = W * H
    pix = jnp.tile(jnp.arange(n, dtype=jnp.uint32), SPP)
    samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), n)
    state = rng_mod.seed_perf(pix, samp, 0)
    state, o, d, t = camera_rays(CAM, W, H, pix, state)
    _, rad = trace(sc, o, d, t, state, DEPTH, attenuate_emission=False,
                   differentiable=True)
    return (jnp.mean(rad.x) + jnp.mean(rad.y) + jnp.mean(rad.z)) / 3.0


R0 = jnp.float32(0.5)
loss_j = jax.jit(loss)
g_int_R = float(jax.jit(jax.grad(loss))(R0))
g_int_cx = float(jax.jit(jax.grad(loss, argnums=1))(R0, jnp.float32(0.0)))

sc0 = build(R0)
ct = jnp.full((H, W, 3), 1.0 / (W * H * 3), jnp.float32)
eg = sphere_silhouette_grad(sc0, CAM, W, H, 0, ct, n_edge=256, spp_edge=64,
                            max_depth=DEPTH, seed=5)
g_edge_R = float(eg.radius)
g_edge_cx = float(eg.center[0])

for h in (0.02, 0.04):
    fd_R = (float(loss_j(R0 + h)) - float(loss_j(R0 - h))) / (2 * h)
    print(f"h={h}: FD_R={fd_R:+.6f}  interior={g_int_R:+.6f} "
          f"edge={g_edge_R:+.6f}  total={g_int_R + g_edge_R:+.6f}")
for h in (0.02, 0.04):
    fd_c = (float(loss_j(R0, jnp.float32(h)))
            - float(loss_j(R0, jnp.float32(-h)))) / (2 * h)
    print(f"h={h}: FD_cx={fd_c:+.6f}  interior={g_int_cx:+.6f} "
          f"edge={g_edge_cx:+.6f}  total={g_int_cx + g_edge_cx:+.6f}")
