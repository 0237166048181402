"""Bisect the WINDOWED wq body (engine.wq.wq_window_fb): measured
18.5 ms/bounce-iter on v5e at bench config vs ~10 expected.  Times a jitted
scan of `window` bounces with stages toggled:

  full        refill + kernel + gather-fixup + deposit/window
  nogather    texel = zeros (no atlas gather)
  nodeposit   skip the window-end scatter-add
  norefill    no grants (kernel + fixup only)
  kernel      bare kernel scan
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
WINDOW = 8
C = 4


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    scene, cam = build_final_scene(W / H)
    n_pix = W * H
    cpp = SPP // C
    quantum = TILE_ROWS * LANE
    lanes = WQ._round_up(min(n_pix, n_pix * SPP), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32
    print(f"lanes={lanes} rows={rows}")

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, W, H),
                             seed=jnp.zeros((1,), jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)

    step = functools.partial(WB.wave_bounce, t_min=1e-3, max_depth=DEPTH,
                             attenuate=False, tile_rows=TILE_ROWS,
                             interpret=False)

    def make(do_refill, do_gather, do_deposit):
        def bounce(carry, _):
            st, ex, counter = carry
            if do_refill:
                # inline copy of wq refill-grant logic (dense only)
                slot0_free = ex.bpix0 < 0.0
                slot1_free = ex.bpix1 < 0.0
                had_chunk = st.pix >= 0.0
                dead = st.alive <= 0.0
                elig = dead & ((slot0_free | slot1_free)
                               | jnp.logical_not(had_chunk))
                elig_i = elig.reshape(-1).astype(jnp.int32)
                rank = jnp.cumsum(elig_i) - elig_i
                navail = jnp.int32(n_pix * cpp) - counter
                grant = (elig.reshape(-1) & (rank < navail)).reshape(sh)
                cid = counter + rank.reshape(sh)
                pix_new = (cid // cpp).astype(f32)
                s0 = ((cid % cpp) * C).astype(f32)
                do_bank = grant & had_chunk
                use0 = do_bank & slot0_free
                use1 = do_bank & jnp.logical_not(slot0_free)
                ex = ex._replace(
                    bpix0=jnp.where(use0, st.pix, ex.bpix0),
                    br0=jnp.where(use0, st.accx, ex.br0),
                    bg0=jnp.where(use0, st.accy, ex.bg0),
                    bb0=jnp.where(use0, st.accz, ex.bb0),
                    bpix1=jnp.where(use1, st.pix, ex.bpix1),
                    br1=jnp.where(use1, st.accx, ex.br1),
                    bg1=jnp.where(use1, st.accy, ex.bg1),
                    bb1=jnp.where(use1, st.accz, ex.bb1))
                st = st._replace(
                    pix=jnp.where(grant, pix_new, st.pix),
                    s=jnp.where(grant, s0 - 1.0, st.s),
                    send=jnp.where(grant, s0 + f32(C), st.send),
                    accx=jnp.where(grant, 0.0, st.accx),
                    accy=jnp.where(grant, 0.0, st.accy),
                    accz=jnp.where(grant, 0.0, st.accz))
                counter = counter + jnp.minimum(jnp.sum(elig_i), navail)
            out = step(tables, st)
            st = out.state
            if do_gather:
                idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
                texel = atlas_u32[idx.reshape(-1)].reshape(sh)
            else:
                texel = (out.fix_idx.astype(jnp.uint32) * 0)
            txr = (texel & 0xFF).astype(f32) / 255.0
            txg = ((texel >> 8) & 0xFF).astype(f32) / 255.0
            txb = ((texel >> 16) & 0xFF).astype(f32) / 255.0
            is_alb = out.fix_kind == f32(WB.FIX_ALBEDO)
            is_emit = out.fix_kind == f32(WB.FIX_EMIT)
            st = st._replace(
                tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
                tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
                tpz=jnp.where(is_alb, st.tpz * txb, st.tpz),
                accx=jnp.where(is_emit, st.accx + out.fwx * txr, st.accx),
                accy=jnp.where(is_emit, st.accy + out.fwy * txg, st.accy),
                accz=jnp.where(is_emit, st.accz + out.fwz * txb, st.accz))
            return (st, ex, counter), None

        @jax.jit
        def win(st, ex, counter, fb):
            (st, ex, counter), _ = jax.lax.scan(
                bounce, (st, ex, counter), None, length=WINDOW)
            if do_deposit:
                di0 = jnp.where(ex.bpix0 >= 0.0, ex.bpix0, f32(n_pix))
                di1 = jnp.where(ex.bpix1 >= 0.0, ex.bpix1, f32(n_pix))
                idx = jnp.concatenate(
                    [di0.reshape(-1), di1.reshape(-1)]).astype(jnp.int32)
                vals = jnp.concatenate([
                    jnp.stack([ex.br0.reshape(-1), ex.bg0.reshape(-1),
                               ex.bb0.reshape(-1)], axis=1),
                    jnp.stack([ex.br1.reshape(-1), ex.bg1.reshape(-1),
                               ex.bb1.reshape(-1)], axis=1)])
                fb = fb.at[idx].add(vals)
            return st, ex, counter, fb

        return win

    st0 = WQ._zeros_state(rows)
    st0 = st0._replace(s=jnp.full(sh, -1.0, f32),
                       pix=jnp.full(sh, -1.0, f32))
    ex0 = WQ._zeros_extra(rows)
    fb0 = jnp.zeros((n_pix + 1, 3), f32)
    c0 = jnp.int32(0)

    # warm the state so lanes are mid-flight (more realistic mix)
    warm = make(True, True, True)
    st, ex, counter, fb = st0, ex0, c0, fb0
    for _ in range(4):
        st, ex, counter, fb = warm(st, ex, counter, fb)
    jax.block_until_ready(st.ox)

    for name, flags in [("full", (True, True, True)),
                        ("nogather", (True, False, True)),
                        ("nodeposit", (True, True, False)),
                        ("norefill", (False, True, False)),
                        ("kernel-ish", (False, False, False))]:
        fn = make(*flags)
        ms = timeit(fn, st, ex, counter, fb)
        print(f"{name:>10}: {ms:7.2f} ms/window  {ms/WINDOW:6.2f} ms/bounce",
              flush=True)


if __name__ == "__main__":
    main()
