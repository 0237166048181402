"""Round-3 profiling: split the wq step cost into kernel / scatter /
gather / refill on the real chip, and probe cheaper alternatives.

Run: python tools/prof_r3_glue.py
"""
import functools
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50
LANE = 128
TILE_ROWS = 32


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    scene, cam = build_final_scene(W / H)
    n_pix = W * H
    total = n_pix * SPP
    quantum = TILE_ROWS * LANE
    lanes = WQ._round_up(min(n_pix, total), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    print(f"lanes={lanes} rows={rows}")

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    print(f"atlas texels={n_atlas}")

    key = jax.random.PRNGKey(0)
    st = WQ._zeros_state(rows)
    st = st._replace(
        ox=jax.random.normal(key, sh), oy=jax.random.normal(key, sh) + 2.0,
        oz=jax.random.normal(key, sh),
        dx=jax.random.normal(key, sh), dy=jax.random.normal(key, sh) - 0.3,
        dz=jax.random.normal(key, sh),
        tm=jax.random.uniform(key, sh),
        rng=jax.random.randint(key, sh, 1, 2**31 - 1).astype(jnp.uint32),
        alive=jnp.ones(sh, jnp.float32),
        tpx=jnp.ones(sh, jnp.float32), tpy=jnp.ones(sh, jnp.float32),
        tpz=jnp.ones(sh, jnp.float32))

    # ---- 1. kernel alone --------------------------------------------------
    for tr in (16, 32, 64):
        step = jax.jit(functools.partial(
            WB.wave_bounce, t_min=1e-3, max_depth=DEPTH, attenuate=False,
            tile_rows=tr, interpret=False))
        ms = timeit(lambda: step(tables, st))
        print(f"kernel tile_rows={tr}: {ms:.2f} ms")

    # ---- 2. framebuffer scatter-add --------------------------------------
    pix = jax.random.randint(key, (lanes,), 0, n_pix)
    vals3 = jax.random.normal(key, (lanes, 3))
    fb3 = jnp.zeros((n_pix, 3))
    f_sc3 = jax.jit(lambda fb, p, v: fb.at[p].add(v))
    print(f"scatter (lanes,3) stacked: {timeit(f_sc3, fb3, pix, vals3):.2f} ms")

    fb1 = jnp.zeros((n_pix,))
    v1 = vals3[:, 0]
    f_sc1 = jax.jit(lambda fb, p, v: fb.at[p].add(v))
    print(f"scatter (lanes,) single:  {timeit(f_sc1, fb1, pix, v1):.2f} ms")

    f_sc1d = jax.jit(lambda fb, p, v: fb.at[p].add(v, mode="drop"))
    print(f"scatter single drop:      {timeit(f_sc1d, fb1, pix, v1):.2f} ms")

    # sort-based segment-sum alternative
    @jax.jit
    def f_sortsum(fb, p, v):
        order = jnp.argsort(p)
        ps = p[order]
        vs = v[order]
        return fb.at[ps].add(vs)
    print(f"scatter sorted-add:       {timeit(f_sortsum, fb1, pix, v1):.2f} ms")

    # ---- 3. atlas gather ---------------------------------------------------
    idx2 = jax.random.randint(key, sh, 0, n_atlas)
    g_take = jax.jit(lambda t, i: jnp.take(t, i.reshape(-1),
                                           mode="clip").reshape(sh))
    print(f"gather take u32:          {timeit(g_take, atlas_u32, idx2):.2f} ms")
    g_idx = jax.jit(lambda t, i: t[i.reshape(-1)].reshape(sh))
    print(f"gather [] u32:            {timeit(g_idx, atlas_u32, idx2):.2f} ms")
    atlas_f = atlas_u32.astype(jnp.float32)
    g_f = jax.jit(lambda t, i: jnp.take(t, i.reshape(-1),
                                        mode="clip").reshape(sh))
    print(f"gather take f32:          {timeit(g_f, atlas_f, idx2):.2f} ms")
    # small-count gather (only 32K pending)
    idx_small = jax.random.randint(key, (32768,), 0, n_atlas)
    g_s = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
    print(f"gather take 32K:          {timeit(g_s, atlas_u32, idx_small):.2f} ms")

    # ---- 4. refill cost ----------------------------------------------------
    cnt0 = jnp.int32(0)

    @jax.jit
    def f_refill(st, counter):
        ns, nc = _refill(st, counter)
        return ns.ox, nc

    # reproduce wq's refill inline
    from path_tracer_tpu.core import rng as rng_mod
    from path_tracer_tpu.engine.integrator import camera_rays

    def _refill(st, counter):
        dead = st.alive <= 0.0
        dead_i = dead.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i
        navail = total - counter
        grant_f = dead.reshape(-1) & (rank < navail)
        sid = counter + rank
        pix_new = sid // SPP
        k_new = sid - pix_new * SPP
        rng0 = rng_mod.splitmix32(
            pix_new.astype(jnp.uint32)
            ^ rng_mod.splitmix32(k_new.astype(jnp.uint32)))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, W, H, pix_new, rng0)
        grant = grant_f.reshape(sh)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        st = st._replace(ox=sel(o.x, st.ox), oy=sel(o.y, st.oy),
                         oz=sel(o.z, st.oz), dx=sel(d.x, st.dx),
                         dy=sel(d.y, st.dy), dz=sel(d.z, st.dz))
        n_grant = jnp.minimum(jnp.sum(dead_i), navail)
        return st, counter + n_grant

    st_half = st._replace(alive=(jax.random.uniform(key, sh) > 0.5)
                          .astype(jnp.float32))
    print(f"refill (half dead):       {timeit(f_refill, st_half, cnt0):.2f} ms")

    # ---- 5. in-kernel gather probe -----------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gather_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take(tab_ref[:], idx_ref[:, :], axis=0)

    try:
        tab_small = atlas_u32[:8192]
        idx_i = (idx2 % 8192).astype(jnp.int32)
        out = pl.pallas_call(
            gather_kernel,
            grid=(rows // TILE_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(sh, jnp.uint32),
        )(tab_small, idx_i)
        jax.block_until_ready(out)
        f = jax.jit(lambda t, i: pl.pallas_call(
            gather_kernel,
            grid=(rows // TILE_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(sh, jnp.uint32))(t, i))
        print(f"pallas in-kernel take 8K table: {timeit(f, tab_small, idx_i):.2f} ms")
    except Exception as e:
        print(f"pallas in-kernel take FAILED: {type(e).__name__}: {str(e)[:300]}")

    # full-size table
    try:
        n_pad = ((n_atlas + 127) // 128) * 128
        tab_full = jnp.pad(atlas_u32, (0, n_pad - n_atlas))
        idx_f = idx2.astype(jnp.int32)
        f2 = jax.jit(lambda t, i: pl.pallas_call(
            gather_kernel,
            grid=(rows // TILE_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(sh, jnp.uint32))(t, i))
        print(f"pallas in-kernel take full atlas: {timeit(f2, tab_full, idx_f):.2f} ms")
    except Exception as e:
        print(f"pallas in-kernel take FULL FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
