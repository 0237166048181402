"""Megakernel wavefront renderer — the TPU perf path.

Each `while_loop` iteration is ONE pallas dispatch (`wave_bounce`) that
advances every lane a bounce and regenerates finished lanes onto their next
sample, plus a tiny XLA fixup for image-texture lanes (the only gather per
bounce).  Replaces the jnp bounce pipeline whose XLA glue cost ~8x the
intersection arithmetic (see ops/pallas/wave_bounce.py docstring).

Load balancing (the wavefront straggler problem): with one lane per pixel,
a whole-frame render is gated by the heaviest pixel — pixels staring into
dielectric/smoke trace ~50-bounce paths for EVERY sample while the mean path
is ~2.7 segments, so naive SIMD occupancy decays to ~10%.  Two phases fix
it:

* **Phase A** renders `spp_a` samples with lane == pixel while counting each
  lane's traced segments (`wrk`).
* **Phase B** renders the remaining samples with lanes allocated to pixels
  in proportion to measured phase-A cost (heavy pixels get many lanes, each
  taking an interleaved sample stride), computed in-graph with a
  cumsum-floor split + searchsorted, and deposited with one scatter-add per
  render.

The lane budget `lane_factor` (default 1.25x pixels) is the extra capacity
phase B hands to heavy pixels.

Forward-only: gradients use engine.integrator's jnp path (differentiable=
True).  Parity-mode golden tests also use the jnp path; this renderer's
output is equivalent up to float reassociation (see tests/test_wave.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB

LANE = WB.LANE


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _init_state(rows: int, pix: jnp.ndarray, s0: jnp.ndarray,
                send: jnp.ndarray, strd: jnp.ndarray) -> WB.WaveState:
    f32 = jnp.float32
    sh = (rows, LANE)
    z = jnp.zeros(sh, f32)
    return WB.WaveState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=z, tm=z,
        rng=jnp.zeros(sh, jnp.uint32),
        tpx=z, tpy=z, tpz=z, radx=z, rady=z, radz=z,
        accx=z, accy=z, accz=z,
        alive=z, s=s0, bnc=z, wrk=z,
        pix=pix, send=send, strd=strd,
    )


def _run_phase(tables: WB.SceneTables, st: WB.WaveState, atlas: jnp.ndarray,
               *, t_min: float, max_depth: int, attenuate: bool,
               tile_rows: int, interpret: bool
               ) -> Tuple[WB.WaveState, jnp.ndarray]:
    """Run the bounce loop until every lane has exhausted its samples.
    Returns (final state, traced segment count).

    Per-iteration XLA work is ONE flat u32 gather (the atlas texel for the
    previous bounce's image-texture fixup, applied inside the next kernel
    call) plus the `any(alive)` loop condition; everything else lives in
    the pallas kernel.  Segment counts come from the kernel's per-lane
    `wrk` accumulator, not a per-step reduction."""
    n_atlas = atlas.shape[0]
    # pack atlas rgb-u8 rows into one u32 per texel; XLA hoists this out
    # of the loop (texture.hpp:139-150 sampling happens in-kernel).
    a32 = atlas.astype(jnp.uint32)
    atlas_u32 = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)

    def gather_texels(out: WB.WaveOut) -> jnp.ndarray:
        idx = jnp.clip(out.fix_idx.astype(jnp.int32), 0, n_atlas - 1)
        return jnp.take(atlas_u32, idx, axis=0)

    step0 = functools.partial(WB.wave_bounce, t_min=t_min,
                              max_depth=max_depth, attenuate=attenuate,
                              tile_rows=tile_rows, interpret=interpret)

    # first step starts the initial paths (all lanes enter dead with
    # s = -stride, so the kernel's regeneration path launches them)
    out = step0(tables, st)

    def cond(out: WB.WaveOut):
        return jnp.any(out.state.alive > 0.0)

    def body(out: WB.WaveOut):
        return step0(tables, out.state, out, gather_texels(out))

    out = jax.lax.while_loop(cond, body, out)

    # loop exits with at most an EMIT fixup pending (ALBEDO is gated on the
    # lane staying alive); apply it in XLA.
    st = out.state
    texel = gather_texels(out)
    scale = jnp.float32(1.0 / 255.0)
    txr = (texel & 0xFF).astype(jnp.float32) * scale
    txg = ((texel >> 8) & 0xFF).astype(jnp.float32) * scale
    txb = ((texel >> 16) & 0xFF).astype(jnp.float32) * scale
    is_emit = out.fix_kind == WB.FIX_EMIT
    st = st._replace(
        accx=st.accx + jnp.where(is_emit, out.fwx * txr, 0.0),
        accy=st.accy + jnp.where(is_emit, out.fwy * txg, 0.0),
        accz=st.accz + jnp.where(is_emit, out.fwz * txb, 0.0),
    )
    segs = jnp.sum(st.wrk)
    return st, segs


@functools.partial(jax.jit,
                   static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _render_wave_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                     spp: int, max_depth: int, attenuate: bool, t_min: float,
                     tile_rows: int, lane_factor: float, spp_a: int,
                     interpret: bool, seed: jnp.ndarray):
    n_pix = width * height
    quantum = tile_rows * LANE
    rows_a = _round_up(n_pix, quantum) // LANE
    lanes_a = rows_a * LANE

    tables = WB.pack_scene(scene)
    tables = tables._replace(cam=WB.pack_camera(cam, width, height),
                             seed=seed.reshape(1).astype(jnp.uint32))
    atlas = scene.textures.atlas

    run = functools.partial(_run_phase, tables, atlas=atlas, t_min=t_min,
                            max_depth=max_depth, attenuate=attenuate,
                            tile_rows=tile_rows, interpret=interpret)

    f32 = jnp.float32
    sh_a = (rows_a, LANE)
    lane_ids = (jnp.arange(lanes_a, dtype=jnp.int32).reshape(sh_a))
    pix_a = jnp.minimum(lane_ids, n_pix - 1).astype(f32)
    is_real = lane_ids < n_pix
    send_a = jnp.where(is_real, f32(spp_a), 0.0)
    st = _init_state(rows_a, pix_a, jnp.full(sh_a, -1.0, f32), send_a,
                     jnp.ones(sh_a, f32))
    st, segs = run(st=st)
    fb = jnp.stack([st.accx.reshape(-1)[:n_pix],
                    st.accy.reshape(-1)[:n_pix],
                    st.accz.reshape(-1)[:n_pix]])

    if spp_a < spp:
        # ---- phase B: cost-proportional lane allocation ------------------
        spp_b = spp - spp_a
        lanes_b = _round_up(int(n_pix * lane_factor), quantum)
        rows_b = lanes_b // LANE
        w = jnp.maximum(st.wrk.reshape(-1)[:n_pix], 1.0)
        extra = f32(lanes_b - n_pix)
        cum = jnp.cumsum(w)
        total = cum[-1]
        r = jnp.floor(cum * (extra / total)).astype(jnp.int32)
        extra_p = jnp.diff(r, prepend=jnp.int32(0))
        c = 1 + extra_p                                # lanes per pixel
        starts = jnp.cumsum(c) - c
        lane_j = jnp.arange(lanes_b, dtype=jnp.int32)
        pix_b = jnp.searchsorted(starts, lane_j, side="right") - 1
        pix_b = jnp.clip(pix_b, 0, n_pix - 1)
        rank = lane_j - jnp.take(starts, pix_b)
        c_lane = jnp.take(c, pix_b)
        # lane covers samples spp_a + rank, + stride c_lane, below spp
        s0 = (f32(spp_a) + rank.astype(f32) - c_lane.astype(f32))
        valid = rank < c_lane          # trailing pad lanes (clip artifacts)
        send_b = jnp.where(valid, f32(spp), 0.0).reshape(rows_b, LANE)
        st_b = _init_state(rows_b, pix_b.astype(f32).reshape(rows_b, LANE),
                           s0.reshape(rows_b, LANE), send_b,
                           c_lane.astype(f32).reshape(rows_b, LANE))
        st_b, segs_b = run(st=st_b)
        segs = segs + segs_b
        acc_b = jnp.stack([st_b.accx.reshape(-1), st_b.accy.reshape(-1),
                           st_b.accz.reshape(-1)], axis=1)
        fb_b = jnp.zeros((n_pix, 3), f32).at[pix_b].add(acc_b)
        fb = fb + fb_b.T

    img = (fb / f32(spp)).T.reshape(height, width, 3)
    return img, segs


def render_wave(scene: T.Scene, cam: Camera, width: int, height: int,
                spp: int, max_depth: int = 50,
                attenuate_emission: bool = False, t_min: float = 1e-3,
                seed: int = 0, tile_rows: Optional[int] = None,
                lane_factor: float = 1.25, spp_a: Optional[int] = None,
                interpret: Optional[bool] = None,
                return_segments: bool = False):
    """Render with the bounce megakernel.  Output (H, W, 3), fb row 0 =
    image bottom (flip at save, main.cpp:41).  On CPU backends the kernel
    runs in pallas interpret mode (slow; tests only)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = WB.DEF_TILE_ROWS if not interpret else 8
    if spp_a is None:
        # phase A runs at lane==pixel occupancy (~mean/max path length, bad)
        # purely to measure per-pixel cost — keep it tiny.
        spp_a = max(1, min(spp // 64, 2))
    spp_a = min(spp_a, spp)
    img, segs = _render_wave_jit(scene, cam, width, height, spp, max_depth,
                                 bool(attenuate_emission), float(t_min),
                                 int(tile_rows), float(lane_factor),
                                 int(spp_a), bool(interpret),
                                 jnp.uint32(seed))
    if return_segments:
        return img, segs
    return img
