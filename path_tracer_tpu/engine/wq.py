"""Work-queue wavefront renderer — the TPU production path.

Drives the `wave_bounce` pallas megakernel with a **global sample queue**
instead of pixel-pinned lanes: every step, lanes whose path terminated are
immediately refilled with the next (pixel, sample) from a shared counter, so
no lane ever idles waiting for a straggler pixel (the reference's per-pixel
sample loop, render.hpp:95-101, serializes samples per work-item; the
pixel-pinned wave renderer inherited that shape and measured **7%** SIMD
occupancy on the final scene — heavy dielectric/smoke pixels trace ~50-bounce
paths for all their samples while the mean path is ~2.7 segments).

Per step (one `while_loop` iteration, all on device):

1. **refill** (XLA): rank dead lanes with a cumsum, grant each the next
   sample id from the counter, seed its counter-based RNG stream
   (`core.rng.seed_perf`) and generate its camera ray with
   `integrator.camera_rays` — the same 5-draw sequence the kernel's
   in-chunk regeneration uses, so per-(pixel, sample) results are
   unchanged.
2. **bounce** (pallas): `wave_bounce` advances every live lane one segment.
3. **fixup** (XLA): one flat gather resolves image-texture atlas texels;
   ALBEDO fixups multiply lane throughput, EMIT fixups deposit straight to
   the framebuffer (texture.hpp:139-150).
4. **deposit** (XLA): finished-sample radiance (the kernel folds it into
   `acc`, which this driver zeroes every step so `acc` *is* the per-step
   delta) is scatter-added into the framebuffer; ~0.4 ms for 600K lanes.

Occupancy therefore stays near 1 until the queue drains (tail = one path
length, <= max_depth steps).  Measured on v5e: 0.07 -> ~0.9 occupancy vs the
two-phase wave renderer.

Work order is pixel-major (sample id = pixel * spp + k), so the queue, the
deposit and the RNG streams are all pure functions of the (pixel, sample)
pair — results are independent of lane scheduling up to f32 scatter-add
reassociation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB
from .integrator import camera_rays

LANE = WB.LANE
DEF_TILE_ROWS = 32      # v5e sweep winner (tools/prof_tiles.py): 32 rows
                        # beats 64 by ~1.3x (VMEM working set per program)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _zeros_state(rows: int) -> WB.WaveState:
    f32 = jnp.float32
    sh = (rows, LANE)
    z = jnp.zeros(sh, f32)
    return WB.WaveState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=z, tm=z,
        rng=jnp.zeros(sh, jnp.uint32),
        tpx=z, tpy=z, tpz=z, radx=z, rady=z, radz=z,
        accx=z, accy=z, accz=z,
        alive=z, s=jnp.full(sh, -1.0, f32), bnc=z, wrk=z,
        pix=z, send=z, strd=jnp.ones(sh, f32),
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _render_wq_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                   spp: int, max_depth: int, attenuate: bool, t_min: float,
                   tile_rows: int, interpret: bool, seed: jnp.ndarray):
    n_pix = width * height
    total = n_pix * spp
    assert total < 2 ** 31, "sample ids must fit int32"
    quantum = tile_rows * LANE
    lanes = _round_up(min(n_pix, total), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, width, height),
                             seed=seed.reshape(1).astype(jnp.uint32))
    atlas = scene.textures.atlas
    n_atlas = atlas.shape[0]
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    inv255 = f32(1.0 / 255.0)

    step = functools.partial(WB.wave_bounce, t_min=t_min,
                             max_depth=max_depth, attenuate=attenuate,
                             tile_rows=tile_rows, interpret=interpret)

    def refill(st: WB.WaveState, counter: jnp.ndarray) -> Tuple[
            WB.WaveState, jnp.ndarray]:
        """Grant dead lanes the next sample ids and launch their camera
        rays (same draws as the kernel regen path: jitter u, v then
        disk(2) + time(1), render.hpp:96-99)."""
        dead = st.alive <= 0.0
        dead_i = dead.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i            # exclusive prefix
        navail = total - counter
        grant_f = dead.reshape(-1) & (rank < navail)
        sid = counter + rank                          # valid where grant
        pix_new = sid // spp
        k_new = sid - pix_new * spp
        # same stream seed the kernel's regen computes:
        # splitmix(pix ^ splitmix(k ^ seed)), never 0 (core.rng.seed_perf).
        rng0 = rng_mod.splitmix32(
            pix_new.astype(jnp.uint32)
            ^ rng_mod.splitmix32(k_new.astype(jnp.uint32)
                                 ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, width, height, pix_new, rng0)

        grant = grant_f.reshape(sh)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        st = st._replace(
            ox=sel(o.x, st.ox), oy=sel(o.y, st.oy), oz=sel(o.z, st.oz),
            dx=sel(d.x, st.dx), dy=sel(d.y, st.dy), dz=sel(d.z, st.dz),
            tm=sel(tmv, st.tm),
            rng=jnp.where(grant, rng1.reshape(sh), st.rng),
            tpx=jnp.where(grant, one, st.tpx),
            tpy=jnp.where(grant, one, st.tpy),
            tpz=jnp.where(grant, one, st.tpz),
            radx=jnp.where(grant, zero, st.radx),
            rady=jnp.where(grant, zero, st.rady),
            radz=jnp.where(grant, zero, st.radz),
            alive=jnp.where(grant, one, st.alive),
            s=sel(k_new.astype(f32), st.s),
            bnc=jnp.where(grant, zero, st.bnc),
            pix=sel(pix_new.astype(f32), st.pix),
            # send == s: the kernel's in-chunk regen never fires; the queue
            # is the only sample source.
            send=sel(k_new.astype(f32), st.send),
        )
        n_grant = jnp.minimum(jnp.sum(dead_i), navail)
        return st, counter + n_grant

    def unpack_texel(tex_u):
        r = (tex_u & 0xFF).astype(f32) * inv255
        g = ((tex_u >> 8) & 0xFF).astype(f32) * inv255
        b = ((tex_u >> 16) & 0xFF).astype(f32) * inv255
        return r, g, b

    def body(carry):
        st, counter, fb, iters = carry
        st, counter = refill(st, counter)
        out = step(tables, st)
        st = out.state

        # resolve this step's image-texture fixups entirely here: gather
        # texels once, multiply ALBEDO lanes' throughput, deposit EMIT
        # lanes' weighted emission (their sample just ended).
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        texel = atlas_u32[idx.reshape(-1)].reshape(sh)
        txr, txg, txb = unpack_texel(texel)
        is_alb = out.fix_kind == WB.FIX_ALBEDO
        is_emit = out.fix_kind == WB.FIX_EMIT
        st = st._replace(
            tpx=jnp.where(is_alb, st.tpx * txr, st.tpx),
            tpy=jnp.where(is_alb, st.tpy * txg, st.tpy),
            tpz=jnp.where(is_alb, st.tpz * txb, st.tpz),
        )
        emit_r = jnp.where(is_emit, out.fwx * txr, 0.0)
        emit_g = jnp.where(is_emit, out.fwy * txg, 0.0)
        emit_b = jnp.where(is_emit, out.fwz * txb, 0.0)

        # deposit: acc was zero going in, so it now holds exactly the
        # radiance of samples that finished this step.
        pix_i = st.pix.reshape(-1).astype(jnp.int32)
        vals = jnp.stack([st.accx.reshape(-1) + emit_r.reshape(-1),
                          st.accy.reshape(-1) + emit_g.reshape(-1),
                          st.accz.reshape(-1) + emit_b.reshape(-1)], axis=1)
        fb = fb.at[pix_i].add(vals)
        z = jnp.zeros_like(st.accx)
        st = st._replace(accx=z, accy=z, accz=z)
        return st, counter, fb, iters + 1

    def cond(carry):
        st, counter, fb, iters = carry
        return (counter < total) | jnp.any(st.alive > 0.0)

    st0 = _zeros_state(rows)
    fb0 = jnp.zeros((n_pix, 3), f32)
    st, counter, fb, iters = jax.lax.while_loop(
        cond, body, (st0, jnp.int32(0), fb0, jnp.int32(0)))

    img = (fb / f32(spp)).reshape(height, width, 3)
    segs = jnp.sum(st.wrk)
    return img, segs, iters


def render_wq(scene: T.Scene, cam: Camera, width: int, height: int,
              spp: int, max_depth: int = 50,
              attenuate_emission: bool = False, t_min: float = 1e-3,
              seed: int = 0, tile_rows: Optional[int] = None,
              interpret: Optional[bool] = None,
              return_stats: bool = False):
    """Render with the work-queue megakernel.  Output (H, W, 3), fb row 0 =
    image bottom (flip at save, main.cpp:41).  On CPU backends the kernel
    runs in pallas interpret mode (slow; tests only)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = DEF_TILE_ROWS if not interpret else 8
    img, segs, iters = _render_wq_jit(
        scene, cam, width, height, spp, max_depth,
        bool(attenuate_emission), float(t_min), int(tile_rows),
        bool(interpret), jnp.uint32(seed))
    if return_stats:
        return img, segs, iters
    return img
