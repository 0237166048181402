"""Round-4: time sphere_fold (broadcast-layout: rays on sublanes x 128
sphere table columns on lanes) at bench lane count on the final scene's
sphere set, input-chained so the tunnel cannot fake it
(docs/PERF_NOTES.md "beware fake-fast standalone timings").

This decides whether porting the layout into bounce_core can hit the
<=1.5 ms/483K-lane kernel target (VERDICT r4 task #1).
"""
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.core.vec import Vec3
from path_tracer_tpu.ops.pallas.sphere_fold import sphere_fold
from path_tracer_tpu.scene.presets import build_final_scene

N = 483328


def main():
    scene, cam = build_final_scene(800 / 600)
    sph = scene.spheres
    print("spheres:", int(sph.radius.shape[0]),
          "active:", int(jnp.sum(sph.active)))
    med_scans = jnp.where(scene.media.active, scene.media.scan, 2 ** 30)
    med_scans = med_scans[scene.media.active][:1].astype(jnp.int32)

    key = jax.random.PRNGKey(0)
    ro = Vec3(*(jax.random.uniform(k, (N,), jnp.float32, -5, 15)
                for k in jax.random.split(key, 3)))
    rd = Vec3(*(jax.random.uniform(k, (N,), jnp.float32, -1, 1)
                for k in jax.random.split(jax.random.PRNGKey(1), 3)))
    rtime = jnp.zeros((N,), jnp.float32)

    @jax.jit
    def chained(ro_x, n_iter):
        def body(c, _):
            rx = c
            t, idx, pref = sphere_fold(
                sph, Vec3(rx, ro.y, ro.z), rd, 1e-3, rtime, med_scans)
            # feed t back so iterations chain
            rx = rx + jnp.where(jnp.isfinite(t), t * 1e-9, 0.0)
            return rx, (jnp.sum(jnp.isfinite(t)), jnp.sum(idx))
        rx, aux = jax.lax.scan(body, ro_x, None, length=n_iter)
        return rx, aux

    # separate warmup variant first so the timed one is not first-compiled
    out = chained(ro.x, 3); jax.block_until_ready(out)
    n_iter = 20
    out = chained(ro.x, n_iter); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(ro.x, n_iter)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / n_iter * 1e3
    hits = int(out[1][0][-1])
    print(f"sphere_fold: {ms:.3f} ms / {N} lanes x 512 sphere slots "
          f"({ms*1e6/N*1000:.2f} ps/lane-sphere... {hits} hits)")
    pairs = N * 512
    print(f"  = {pairs/ (ms/1e3) /1e12:.2f} T pairs/s")


if __name__ == "__main__":
    main()
