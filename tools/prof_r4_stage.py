"""Round-4 kernel composition + texture-lane fraction.

(a) Ablation table of the megakernel's internal stages (bounce_core
    `ablate` flags) on a chained scan at bench lane count — names every ms
    of the kernel for docs/PERF_NOTES.md.
(b) Fraction of lanes with a pending image-texture fixup per bounce in a
    realistic queue mix — decides whether compacting the per-bounce atlas
    gather (today ~3.5 ms/full-width bounce, the largest glue item) to the
    texture lanes only can beat the dense gather.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine import wq as WQ
from path_tracer_tpu.ops.pallas import wave_bounce as WB
from path_tracer_tpu.scene.presets import build_final_scene

W, H, SPP, DEPTH = 800, 600, 80, 50
LANE = 128
TILE_ROWS = 64


def main():
    scene, cam = build_final_scene(W / H)
    n_pix = W * H
    lanes = WQ._round_up(min(n_pix, n_pix * SPP), TILE_ROWS * LANE)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32
    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))

    # ---- (b) texture-lane fraction over a realistic mix ------------------
    # run the REAL windowed body python-unrolled for 48 bounces from a cold
    # queue, counting fix_kind != NONE after each kernel call
    atlas_flat, n_atlas = WQ._pack_atlas_flat(scene.textures.atlas)
    C = WQ.pick_chunk(SPP)
    cpp = SPP // C
    n_chunks = n_pix * cpp
    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    @jax.jit
    def bounce_once(st, counter):
        # minimal refill (no banking, acc ignored: we only want the mix)
        dead = st.alive <= 0.0
        dead_i = dead.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i
        grant = (dead.reshape(-1) & (rank < n_chunks - counter)).reshape(sh)
        cid = counter + rank.reshape(sh)
        pix_new = (cid // cpp).astype(f32)
        s0 = ((cid % cpp) * C).astype(f32)
        from path_tracer_tpu.core import rng as rng_mod
        from path_tracer_tpu.engine.integrator import camera_rays
        pix_u = pix_new.reshape(-1).astype(jnp.uint32)
        rng0 = rng_mod.splitmix32(
            pix_u ^ rng_mod.splitmix32(
                s0.reshape(-1).astype(jnp.uint32) ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, W, H, pix_u, rng0)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        one = jnp.float32(1.0)
        st = st._replace(
            ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
            dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
            tm=sel(tmv, st.tm), rng=jnp.where(grant, rng1.reshape(sh),
                                              st.rng),
            tpx=jnp.where(grant, one, st.tpx),
            alive=jnp.where(grant, one, st.alive),
            bnc=jnp.where(grant, 0.0, st.bnc),
            pix=jnp.where(grant, pix_new, st.pix),
            s=jnp.where(grant, s0, st.s),
            send=jnp.where(grant, s0 + f32(C), st.send))
        counter = counter + jnp.minimum(jnp.sum(dead_i),
                                        n_chunks - counter)
        out = step(tables, st)
        st2 = out.state
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = atlas_flat[idx]
        txr = (texel & 0xFF).astype(f32) / 255.0
        is_alb = out.fix_kind == f32(WB.FIX_ALBEDO)
        st2 = st2._replace(tpx=jnp.where(is_alb, st2.tpx * txr, st2.tpx))
        nfix = jnp.sum((out.fix_kind != 0.0).astype(jnp.int32))
        nlive = jnp.sum((st2.alive > 0.0).astype(jnp.int32))
        return st2, counter, nfix, nlive

    st = WQ._zeros_state(rows)
    st = st._replace(s=jnp.full(sh, -1.0, f32), pix=jnp.full(sh, -1.0, f32))
    counter = jnp.int32(0)
    fracs = []
    for k in range(48):
        st, counter, nfix, nlive = bounce_once(st, counter)
        fracs.append((int(nfix), int(nlive)))
    print("texture-fixup lanes per bounce (nfix / nlive / frac):")
    for k, (nf, nl) in enumerate(fracs):
        if k % 4 == 0:
            print(f"  bounce {k:3d}: {nf:7d} / {nl:7d}  "
                  f"{nf / max(nl, 1):.4f}", flush=True)
    tot = sum(nf for nf, _ in fracs)
    totl = sum(nl for _, nl in fracs)
    print(f"  mean fraction over 48 bounces: {tot / max(totl, 1):.4f}")

    # ---- (a) kernel stage ablations --------------------------------------
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    st0 = WQ._zeros_state(rows)
    st0 = st0._replace(
        ox=jax.random.uniform(ks[0], sh, f32, -5, 15),
        oy=jax.random.uniform(ks[1], sh, f32, 0, 6),
        oz=jax.random.uniform(ks[2], sh, f32, -5, 15),
        dx=jax.random.uniform(ks[3], sh, f32, -1, 1),
        dy=jax.random.uniform(ks[4], sh, f32, -1, 1),
        dz=jax.random.uniform(ks[5], sh, f32, -1, 1),
        rng=jax.random.randint(ks[6], sh, 1, 2 ** 31 - 1).astype(
            jnp.uint32),
        alive=jnp.ones(sh, f32), pix=jnp.zeros(sh, f32),
        s=jnp.zeros(sh, f32), send=jnp.ones(sh, f32) * 2,
        strd=jnp.ones(sh, f32))

    def bench(ab, name, tab=tables):
        stp = functools.partial(WB.wave_bounce, t_min=1e-3,
                                max_depth=DEPTH, attenuate=False,
                                tile_rows=TILE_ROWS, interpret=False,
                                ablate=ab)

        @jax.jit
        def run(st):
            def body(c, _):
                return stp(tab, c).state, None
            st2, _ = jax.lax.scan(body, st, None, length=10)
            return st2
        out = run(st0)
        jax.block_until_ready(out.ox)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(st0)
            jax.block_until_ready(out.ox)
            ts.append(time.perf_counter() - t0)
        print(f"{name:>16}: {min(ts)/10*1e3:.3f} ms/bounce", flush=True)
        return min(ts) / 10 * 1e3

    def cut_spheres(tab, n):
        return tab._replace(sph=tab.sph[:, :n],
                            sph_segs=jnp.clip(tab.sph_segs, 0, n))

    bench(frozenset(), "warm-dummy")
    full = bench(frozenset(), "full")
    nos = bench(frozenset(), "sph4", cut_spheres(tables, 4))
    nomed = bench(frozenset({"media"}), "nomedia")
    notex = bench(frozenset({"tex"}), "notex")
    norect = bench(frozenset({"rects"}), "norects")
    notri = bench(frozenset({"tris"}), "notris")
    allcut = bench(frozenset({"media", "tex", "rects", "tris"}),
                   "allcut+sph4", cut_spheres(tables, 4))
    print(f"\nsphere fold: {full-nos:.3f}  media: {full-nomed:.3f}  "
          f"tex: {full-notex:.3f}  rects: {full-norect:.3f}  "
          f"tris: {full-notri:.3f}  residual(scatter/regen/io): "
          f"{allcut:.3f}")


if __name__ == "__main__":
    main()
