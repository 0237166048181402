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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..core.vec import Vec3
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB
from .integrator import camera_rays

LANE = WB.LANE
DEF_TILE_ROWS = 64      # v5e sweep winner for the 2-carry fold kernel
                        # (tools/prof_r4_bench.py, r4): 64 beats 32 by
                        # ~1.08x; with the old payload-carrying fold 32 won
DEPOSIT_MODE = "2dsep"  # deposit scatter layout (tools/prof_r4_deposit.py):
                        # "2dsep" = six scatter-adds whose index/value
                        # operands keep their (rows, LANE) vector layout —
                        # measured 19.6 -> 14.8 ms/full-width bounce on v5e
                        # vs the flat-concat form ("flat"; "2d" = one
                        # axis-1-concat scatter, no win)
S_SLOTS_OVERRIDE = None  # perf experiment knob: primary slots per row
                        # (default 4: r4 sweep, 81.7 vs 80.2 at S=2)
GATHER_MODE = "slots"   # texel service: "slots" (bounded per-bounce
                        # budget: S primary slots/row + heavy-row spill,
                        # kernel stalls uncovered lanes) | "dense"
SCAN_UNROLL = 64        # window-scan unroll (min'd with window).  Fully
                        # unrolling the 16-bounce window measured 29.7 ->
                        # 44.4 Mray/s on v5e: the rolled scan forced a
                        # layout/spill boundary between the per-bounce
                        # atlas gather and the window deposit


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pack_atlas_flat(atlas: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """Atlas texels packed 0xBBGGRR as one flat u32 vector.

    Negative results worth keeping (tools/prof_r3_rowgather.py +
    prof_r3_skew.py + prof_r3_real.py ablations): (a) gathering 128-wide
    ROWS (idx >> 7) + a one-hot lane select is 2x faster than the flat
    scalar gather in a standalone microbench, but LOSES in the real bounce
    loop — its (N, 128) intermediate adds ~500 MB of HBM traffic per
    bounce and the in-context cost jumped from 3.6 to ~13 ms; (b) index
    skew (90% of lanes fetching the same dummy texel / drop slot) does NOT
    serialize v5e gathers or scatters — uniform and 80%-collided indices
    time identically, so no spreading of dummy indices is needed."""
    a32 = atlas.astype(jnp.uint32)
    flat = a32[:, 0] | (a32[:, 1] << 8) | (a32[:, 2] << 16)
    return flat, flat.shape[0]


def _gather_texels(atlas_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Texel u32 for every (clipped, int32) index in idx, any shape.

    The index shape is passed through to the gather un-flattened: a
    (rows, 128) index block yields a vector-layout result, measured 4.3
    ms/bounce cheaper on v5e than gathering via reshape(-1) at 483k lanes
    (tools/prof_r3_real.py g2d ablation)."""
    return atlas_flat[idx]


def texel_service(fx: WB.FixState, k, atlas_flat: jnp.ndarray,
                  n_atlas: int, *, s_slots: Optional[int] = None,
                  _ablate: frozenset = frozenset()):
    """Resolve atlas texels for pending image-texture fixups under a
    BOUNDED per-bounce budget; returns (texel (rows,128) u32, srv 0/1).
    The kernel applies covered fixups and stalls uncovered lanes
    (wave_bounce._wave_kernel), so any coverage policy is correct —
    this one is sized for the measured mix (~0.2% of lanes pending,
    ~1 pending lane per needy row, tools/prof_r4_stage.py):

    * S_SLOTS primary slots per row: the first S pending lanes of
      every row (in a per-bounce-rotated lane order, so no lane
      starves) — one (rows, S) element gather, ~0.1 ms at bench width
      vs ~3.5-4.7 ms for the dense per-lane gather.
    * spill: rows with more than S pending lanes get FULL-row service,
      up to rows//8 rows per bounce (rotated): one (cap, 128)
      row-gather + element gather.  Texture-heavy scenes (a camera on
      an image texture) throttle to ~8 bounces per full sweep instead
      of overflowing — graceful degradation, never wrong.

    A dense lax.cond fallback was tried and rejected: the cond's mere
    presence in the unrolled window scan cost 2x wall-clock (r4
    measurements: 27.5 vs 93 Mray/s).  Shared by the production windowed
    driver below and the gradient recorder (diff.queued_vjp)."""
    f32 = jnp.float32
    S_SLOTS = s_slots if s_slots is not None else (S_SLOTS_OVERRIDE or 4)
    rws = fx.kind.shape[0]
    idx = jnp.clip(fx.idx.astype(jnp.int32), 0, n_atlas - 1)
    ones = jnp.ones((rws, LANE), f32)
    if "gather" in _ablate:    # profiling only
        return idx.astype(jnp.uint32) * 0, ones
    if GATHER_MODE == "dense":
        return atlas_flat[idx], ones
    need = fx.kind != 0.0
    need_i = need.astype(jnp.int32)
    # lane rank among the row's pending lanes, rotated per bounce
    bo = (k * jnp.int32(37)) % jnp.int32(LANE)
    need_r = jnp.roll(need_i, -bo, axis=1)
    lrank = jnp.roll(jnp.cumsum(need_r, axis=1) - need_r, bo, axis=1)
    # primary slots: one small (rows, S) gather
    sidx = jnp.stack(
        [jnp.sum(jnp.where(need & (lrank == j), idx, 0), axis=1)
         for j in range(S_SLOTS)], axis=1)
    stex = atlas_flat[sidx]                       # (rows, S)
    texel = jnp.zeros((rws, LANE), jnp.uint32)
    for j in range(S_SLOTS):
        texel = jnp.where(need & (lrank == j), stex[:, j:j + 1], texel)
    srv = need & (lrank < S_SLOTS)
    # spill: full-row service for heavy rows, rotated
    cap = max(rws // 8, 1)
    cnt = jnp.sum(need_i, axis=1)                 # (rows,)
    heavy = cnt > S_SLOTS
    rbo = (k * jnp.int32(997)) % jnp.int32(rws)
    heavy_i = heavy.astype(jnp.int32)
    heavy_r = jnp.roll(heavy_i, -rbo)
    hrank = jnp.roll(jnp.cumsum(heavy_r) - heavy_r, rbo)
    served_row = heavy & (hrank < cap)
    slot = jnp.where(served_row, hrank, cap)
    row_ids = jnp.full((cap + 1,), rws, jnp.int32).at[slot].set(
        jnp.arange(rws, dtype=jnp.int32), mode="drop")[:cap]
    cidx = idx[jnp.clip(row_ids, 0, rws - 1)]     # (cap, 128) rows
    ctex = atlas_flat[cidx]
    # expand with a row-GATHER by spill rank (a row scatter here
    # crashes the TPU fusion emitter: SortedScatterEmitter requires
    # sublane-gather inputs)
    back = ctex[jnp.clip(hrank, 0, cap - 1)]      # (rows, 128)
    srow = served_row[:, None] & need
    texel = jnp.where(srow, back, texel)
    return texel, (srv | srow).astype(f32)


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
    atlas_flat, n_atlas = _pack_atlas_flat(scene.textures.atlas)
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
        texel = _gather_texels(atlas_flat, idx)
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
    # lane count returned so callers never re-derive the sizing formula
    # (advisor r3: a silent formula divergence would skew occupancy)
    return img, segs, iters, jnp.float32(lanes)


# ---------------------------------------------------------------------------
# Windowed driver: W bounces of dense-only glue per scatter/gather cycle
# ---------------------------------------------------------------------------

DEF_WINDOW = 32     # bounces per window (deposit amortization).  Grants
                    # launch their camera ray in XLA (alive=1), so a chunk
                    # takes >= chunk kernel calls; with window <= 2*chunk a
                    # lane banks at most twice per window — exactly the two
                    # bank slots: grants never block.  window=32 > 2*chunk
                    # lets a lane fill both slots mid-window and idle until
                    # the flush; that costs ~1.3% occupancy on the bench
                    # scene and wins ~9% wall-clock (r4 sweep: 54.8 vs
                    # 50.8 Mray/s at tile_rows=64; deposit amortizes 2x).
MAX_CHUNK = 10      # samples per grant; C | spp enforced by pick_chunk


def pick_chunk(spp: int, cap: int = MAX_CHUNK) -> int:
    """Largest divisor of spp <= cap: the number of consecutive samples of
    one pixel granted per refill (the kernel regenerates within the chunk,
    so a lane's accumulator stays same-pixel between grants)."""
    for c in range(min(cap, spp), 0, -1):
        if spp % c == 0:
            return c
    return 1


class WqwExtra(NamedTuple):
    """Driver-side per-lane deposit bank the kernel never sees.  All
    (rows, 128) f32.  `bpix/br/bg/bb` x2: banked (pixel, rgb) deposits from
    chunk transitions, flushed by one scatter-add per window (pix < 0 =
    empty).  An early design parked image-texture lanes until a window-end
    texel gather instead of gathering per bounce; it collapsed to 0.10
    occupancy on the final scene (texture-heavy paths need a texel EVERY
    bounce — wq2's failure mode), so texels resolve per bounce here."""
    bpix0: jnp.ndarray
    br0: jnp.ndarray
    bg0: jnp.ndarray
    bb0: jnp.ndarray
    bpix1: jnp.ndarray
    br1: jnp.ndarray
    bg1: jnp.ndarray
    bb1: jnp.ndarray


def _zeros_extra(rows: int) -> WqwExtra:
    sh = (rows, LANE)
    z = jnp.zeros(sh, jnp.float32)
    neg = jnp.full(sh, -1.0, jnp.float32)
    return WqwExtra(bpix0=neg, br0=z, bg0=z, bb0=z,
                    bpix1=neg, br1=z, bg1=z, bb1=z)


def wq_window_fb(scene: T.Scene, cam: Camera, width: int, height: int,
                 *, n_pix_loc: int, spp_loc: int, chunk: int, window: int,
                 max_depth: int, attenuate: bool, t_min: float,
                 tile_rows: int, interpret: bool, seed,
                 pix_base=0, samp_base=0, valid_pix=None, valid_cpp=None,
                 _ablate: frozenset = frozenset()):
    """Windowed work-queue core over a pixel/sample sub-range — traced, not
    jitted, so it runs standalone (full frame) or per-shard under
    `shard_map` (parallel.mesh.render_sharded).

    The framebuffer scatter-add (~4 ms per call on v5e regardless of
    masking — tools/prof_r3_*.py) runs once per `window` bounces; finished
    chunks bank into two per-lane slots in between.  Per bounce only the
    kernel, one atlas gather, and dense XLA (chunk grants, fixup selects)
    run.  Work order: chunks of `chunk` consecutive samples of one pixel,
    pixel-major, so results are a pure function of the global
    (pixel, sample) pair — identical streams to the one-bounce driver
    (core.rng.seed_perf) — and independent of lane scheduling and shard
    assignment up to f32 deposit reassociation.  Reference semantics:
    render.hpp:95-101 sample loop, render.hpp:25-92 integrator.

    Static: `n_pix_loc` (local fb rows / lane sizing), `spp_loc` (max
    samples per pixel handled here; `chunk` | `spp_loc`).  Traced scalars:
    `pix_base`/`samp_base` (global offsets), `valid_pix`/`valid_cpp`
    (clipped work actually granted, for ragged shards; default = full).
    Returns (fb_sum (n_pix_loc, 3) UNnormalized, traced_segments,
    bounce_iters, lane_steps) — lane_steps is the f32 sum of lane-bounces
    actually dispatched (the drain stages run narrowed grids, so
    occupancy = traced_segments / lane_steps)."""
    C = chunk
    cpp_loc = spp_loc // C
    assert cpp_loc * C == spp_loc, (spp_loc, C)
    if valid_pix is None:
        valid_pix = n_pix_loc
    if valid_cpp is None:
        valid_cpp = cpp_loc
    valid_pix = jnp.asarray(valid_pix, jnp.int32)
    valid_cpp = jnp.asarray(valid_cpp, jnp.int32)
    pix_base_f = jnp.asarray(pix_base, jnp.float32)
    samp_base_f = jnp.asarray(samp_base, jnp.float32)
    n_chunks = valid_pix * valid_cpp
    vcpp = jnp.maximum(valid_cpp, 1)
    assert n_pix_loc * spp_loc < 2 ** 31
    quantum = tile_rows * LANE
    lanes = _round_up(min(n_pix_loc, n_pix_loc * spp_loc), quantum)
    rows = lanes // LANE
    sh = (rows, LANE)
    f32 = jnp.float32

    tables = WB.pack_scene(scene)
    tables = tables._replace(
        cam=WB.pack_camera(cam, width, height),
        seed=jnp.asarray(seed).reshape(1).astype(jnp.uint32))
    atlas_flat, n_atlas = _pack_atlas_flat(scene.textures.atlas)
    inv255 = f32(1.0 / 255.0)

    step = functools.partial(WB.wave_bounce, t_min=t_min,
                             max_depth=max_depth, attenuate=attenuate,
                             tile_rows=tile_rows, interpret=interpret)

    def refill(st: WB.WaveState, ex: WqwExtra, counter: jnp.ndarray,
               fx: WB.FixState):
        """Grant dead lanes the next chunk (pixel-major chunk id ->
        (pixel, sample range)) and launch its first camera ray in XLA —
        dense ops only, and the granted lane traces in its very next
        kernel call (no wasted regen-only call).  The draw sequence is the
        kernel's in-chunk regen sequence exactly (core.rng.seed_perf
        seeding + jitter/disk/time draws, render.hpp:96-99), so in-chunk
        sample transitions (bounce_core.camera_ray_block) continue the
        same streams.  Finished chunks bank into a free deposit slot."""
        slot0_free = ex.bpix0 < 0.0
        slot1_free = ex.bpix1 < 0.0
        had_chunk = st.pix >= 0.0
        # a dead lane with a pending EMIT fixup must keep its acc until the
        # texel service covers it (the kernel adds the emission then)
        pend_emit = fx.kind == f32(WB.FIX_EMIT)
        dead = (st.alive <= 0.0) & jnp.logical_not(pend_emit)
        elig = dead & ((slot0_free | slot1_free) | jnp.logical_not(had_chunk))
        elig_i = elig.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(elig_i) - elig_i              # exclusive prefix
        navail = n_chunks - counter
        grant = (elig.reshape(-1) & (rank < navail)).reshape(sh)
        cid = counter + rank.reshape(sh)                # valid where grant
        pix_new = pix_base_f + (cid // vcpp).astype(f32)
        s0 = samp_base_f + ((cid % vcpp) * C).astype(f32)

        # camera ray for (pix_new, s0): same seed + draws as the kernel's
        # regen path (seed_perf: splitmix(pix ^ splitmix(s ^ seed)), 0 ->
        # INITIAL_STATE), computed densely for every lane, selected below.
        pix_u = pix_new.reshape(-1).astype(jnp.uint32)
        s_u = s0.reshape(-1).astype(jnp.uint32)
        rng0 = rng_mod.splitmix32(
            pix_u ^ rng_mod.splitmix32(s_u ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        if "camera" in _ablate:    # profiling only (tools/prof_r3_real.py)
            rng1, o, d, tmv = rng0, Vec3(pix_new.reshape(-1) * 0.0,
                                         s_u * 0.0, s_u * 0.0), \
                Vec3(s_u * 0.0, s_u * 0.0, s_u * 0.0 + 1.0), s_u * 0.0
        else:
            rng1, o, d, tmv = camera_rays(cam, width, height, pix_u, rng0)

        # bank the finished chunk (acc belongs to the old pixel)
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
            bb1=jnp.where(use1, st.accz, ex.bb1),
        )
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)
        sel = lambda new, old: jnp.where(grant, new.reshape(sh), old)
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
            bnc=jnp.where(grant, zero, st.bnc),
            pix=jnp.where(grant, pix_new, st.pix),
            s=jnp.where(grant, s0, st.s),
            send=jnp.where(grant, s0 + f32(C), st.send),
            accx=jnp.where(grant, zero, st.accx),
            accy=jnp.where(grant, zero, st.accy),
            accz=jnp.where(grant, zero, st.accz),
        )
        n_grant = jnp.minimum(jnp.sum(elig_i), navail)
        return st, ex, counter + n_grant

    def bounce(carry, k):
        st, ex, counter, fx = carry
        if "refill" not in _ablate:
            st, ex, counter = refill(st, ex, counter, fx)
        texel, srv = texel_service(fx, k, atlas_flat, n_atlas,
                                   _ablate=_ablate)
        out = step(tables, st, fix=fx, texel=texel, srv=srv)
        fx = WB.FixState(kind=out.fix_kind, idx=out.fix_idx,
                         fwx=out.fwx, fwy=out.fwy, fwz=out.fwz)
        return (out.state, ex, counter, fx), None

    drop = 3 * n_pix_loc            # flat fb: [r-plane, g-plane, b-plane,
    npl = jnp.int32(n_pix_loc)      #          drop slot]

    def deposit(ex: WqwExtra, fb: jnp.ndarray):
        """Flush both bank slots with ONE flat SCALAR scatter-add: (N, 3)
        scatter rows cost ~41 ns/row on v5e while scalar rows cost ~7.5
        (tools/prof_r3_inloop.py), so rgb deposits go to three channel
        planes of a flat fb.  Empty slots hit the drop slot; banked pix
        values are global, fb is local."""
        mode = DEPOSIT_MODE

        def plane_idx2d(bpix):
            valid = bpix >= 0.0
            base = (bpix - pix_base_f).astype(jnp.int32)
            mk = lambda c: jnp.where(valid, base + c * npl, drop)
            return mk(0), mk(1), mk(2)

        if "deposit" in _ablate:   # profiling only
            neg = jnp.full_like(ex.bpix0, -1.0)
            z = jnp.zeros_like(ex.br0)
            return ex._replace(bpix0=neg, br0=z, bg0=z, bb0=z,
                               bpix1=neg, br1=z, bg1=z, bb1=z), fb
        r0, g0, b0 = plane_idx2d(ex.bpix0)
        r1, g1, b1 = plane_idx2d(ex.bpix1)
        if mode == "2d":
            # indices and values keep their (rows, LANE) vector layout;
            # one scatter-add with 2D index/value blocks
            idx = jnp.concatenate([r0, g0, b0, r1, g1, b1], axis=1)
            vals = jnp.concatenate([ex.br0, ex.bg0, ex.bb0,
                                    ex.br1, ex.bg1, ex.bb1], axis=1)
            fb = fb.at[idx].add(vals)
        elif mode == "2dsep":
            for i2, v2 in ((r0, ex.br0), (g0, ex.bg0), (b0, ex.bb0),
                           (r1, ex.br1), (g1, ex.bg1), (b1, ex.bb1)):
                fb = fb.at[i2].add(v2)
        else:
            idx = jnp.concatenate([x.reshape(-1)
                                   for x in (r0, g0, b0, r1, g1, b1)])
            vals = jnp.concatenate([
                ex.br0.reshape(-1), ex.bg0.reshape(-1), ex.bb0.reshape(-1),
                ex.br1.reshape(-1), ex.bg1.reshape(-1), ex.bb1.reshape(-1)])
            fb = fb.at[idx].add(vals)
        neg = jnp.full_like(ex.bpix0, -1.0)
        z = jnp.zeros_like(ex.br0)
        ex = ex._replace(bpix0=neg, br0=z, bg0=z, bb0=z,
                         bpix1=neg, br1=z, bg1=z, bb1=z)
        return ex, fb

    def flush_acc(st: WB.WaveState, fb: jnp.ndarray) -> jnp.ndarray:
        """Scatter every lane's chunk accumulator into the framebuffer
        (same flat channel-plane layout as deposit).  Used at drain-stage
        boundaries (acc is then zeroed by compact) and as the final
        residual flush — deposits are additive, so splitting a chunk's
        acc across flushes only reassociates the f32 sum."""
        valid = (st.pix >= 0.0).reshape(-1)
        base = (st.pix - pix_base_f).astype(jnp.int32).reshape(-1)
        idx = jnp.concatenate([jnp.where(valid, base + c * npl, drop)
                               for c in range(3)])
        vals = jnp.concatenate([st.accx.reshape(-1), st.accy.reshape(-1),
                                st.accz.reshape(-1)])
        return fb.at[idx].add(vals)

    def compact(st: WB.WaveState, fx: WB.FixState, new_rows: int):
        """Pack the live lanes of `st` (and their pending fixups) into a
        (new_rows, 128) state — caller guarantees live count <=
        new_rows*128 (the drain loops' exit conditions).  Dead lanes with
        a pending EMIT fixup count as live: their chunk accumulator still
        owes the emission the texel service will deliver.  Tracing state
        is gathered through the live-rank permutation; acc must already
        be flushed (zeroed here) and wrk already summed into the running
        total (zeroed here).  Pad lanes get alive=0, pix=-1 and s=send=-1
        so the kernel can neither trace nor regenerate them
        (wave_bounce regen gate); their fix state is empty.

        NOTE (advisor r3): compact's correctness rests on a non-local
        invariant — a lane can only be alive=0 with no pending in-chunk
        samples because the kernel's regen fires in the same call a path
        ends (unless a fixup is pending, in which case the lane is kept
        here via the fix mask and regen is deferred by the stall gate)."""
        old = st.ox.shape[0] * LANE
        w = new_rows * LANE
        live = ((st.alive > 0.0) | (fx.kind != 0.0)).reshape(-1)
        live_i = live.astype(jnp.int32)
        rank = jnp.cumsum(live_i) - live_i            # exclusive prefix
        tgt = jnp.where(live & (rank < w), rank, w)   # w = OOB -> dropped
        perm = jnp.zeros((w,), jnp.int32).at[tgt].set(
            jnp.arange(old, dtype=jnp.int32), mode="drop")
        nlive = jnp.sum(live_i)
        valid = (jnp.arange(w, dtype=jnp.int32) < nlive).reshape(
            new_rows, LANE)
        p2 = perm.reshape(new_rows, LANE)             # 2D gather (g2d)
        g = lambda a: a.reshape(-1)[p2]
        z = jnp.zeros((new_rows, LANE), f32)
        neg1 = jnp.full((new_rows, LANE), -1.0, f32)
        fx2 = WB.FixState(kind=jnp.where(valid, g(fx.kind), 0.0),
                          idx=g(fx.idx), fwx=g(fx.fwx), fwy=g(fx.fwy),
                          fwz=g(fx.fwz))
        st2 = WB.WaveState(
            ox=g(st.ox), oy=g(st.oy), oz=g(st.oz),
            dx=g(st.dx), dy=g(st.dy), dz=g(st.dz), tm=g(st.tm),
            rng=g(st.rng),
            tpx=g(st.tpx), tpy=g(st.tpy), tpz=g(st.tpz),
            radx=g(st.radx), rady=g(st.rady), radz=g(st.radz),
            accx=z, accy=z, accz=z,
            alive=jnp.where(valid, g(st.alive), 0.0),
            s=jnp.where(valid, g(st.s), neg1),
            bnc=g(st.bnc), wrk=z,
            pix=jnp.where(valid, g(st.pix), neg1),
            send=jnp.where(valid, g(st.send), neg1),
            strd=jnp.where(valid, g(st.strd), 1.0),
        )
        return st2, fx2

    # Drain-stage schedule: once the chunk queue is exhausted, surviving
    # paths (worst case `chunk`*max_depth bounces of one smoke chunk) used
    # to run on FULL-width lanes — on the final-scene bench that tail was
    # ~300 of 512 iters at near-zero occupancy (tools/prof_r3_real.py).
    # Instead, narrow the state 4x per stage (compact) as the live count
    # decays, so tail bounces run on 1/4 .. 1/64-width grids.
    n_tiles = rows // tile_rows
    stage_tiles = []
    t = n_tiles
    while t > 1 and len(stage_tiles) < 3:
        t = max(1, t // 4)
        stage_tiles.append(t)
    caps = [t * quantum for t in stage_tiles]     # lane capacity per stage
    cap1 = jnp.int32(caps[0] if caps else 0)

    def nlive(st, fx):
        # pending-fixup lanes count: they still owe work/radiance
        return jnp.sum(((st.alive > 0.0)
                        | (fx.kind != 0.0)).astype(jnp.int32))

    def body(carry):
        st, ex, counter, fb, wins, live, fx = carry
        (st, ex, counter, fx), _ = jax.lax.scan(
            bounce, (st, ex, counter, fx),
            jnp.arange(window, dtype=jnp.int32),
            unroll=min(SCAN_UNROLL, window))
        ex, fb = deposit(ex, fb)
        return st, ex, counter, fb, wins + 1, nlive(st, fx), fx

    def cond(carry):
        st, ex, counter, fb, wins, live, fx = carry
        # run wide while chunks remain to grant, then only until the live
        # set fits the first drain stage (or is empty, without stages)
        return (counter < n_chunks) | (live > cap1)

    st0 = _zeros_state(rows)
    st0 = st0._replace(s=jnp.full(sh, -1.0, f32),
                       pix=jnp.full(sh, -1.0, f32))
    ex0 = _zeros_extra(rows)
    fx0 = WB.zero_fix(rows)
    fb0 = jnp.zeros((3 * n_pix_loc + 1,), f32)  # 3 planes + drop slot
    st, ex, counter, fb, wins, live, fx = jax.lax.while_loop(
        cond, body, (st0, ex0, jnp.int32(0), fb0, jnp.int32(0),
                     jnp.int32(0), fx0))
    iters = wins * jnp.int32(window)
    lane_steps = iters.astype(f32) * f32(rows * LANE)
    wrk_tot = f32(0)

    def dbounce(carry, k):
        st, fx = carry
        texel, srv = texel_service(fx, k, atlas_flat, n_atlas,
                                   _ablate=_ablate)
        out = step(tables, st, fix=fx, texel=texel, srv=srv)
        fx = WB.FixState(kind=out.fix_kind, idx=out.fix_idx,
                         fwx=out.fwx, fwy=out.fwy, fwz=out.fwz)
        return (out.state, fx), None

    for i, stiles in enumerate(stage_tiles):
        wrk_tot = wrk_tot + jnp.sum(st.wrk)
        fb = flush_acc(st, fb)
        st, fx = compact(st, fx, stiles * tile_rows)
        next_cap = jnp.int32(caps[i + 1] if i + 1 < len(caps) else 0)
        live0 = nlive(st, fx)

        def dbody(c):
            st, fx, w2, live = c
            (st, fx), _ = jax.lax.scan(
                dbounce, (st, fx), jnp.arange(window, dtype=jnp.int32),
                unroll=min(SCAN_UNROLL, window))
            return st, fx, w2 + 1, nlive(st, fx)

        def dcond(c, _cap=next_cap):
            return c[3] > _cap

        st, fx, w2, live = jax.lax.while_loop(
            dcond, dbody, (st, fx, jnp.int32(0), live0))
        iters = iters + w2 * jnp.int32(window)
        lane_steps = lane_steps + (w2 * jnp.int32(window)).astype(f32) \
            * f32(stiles * tile_rows * LANE)

    # residual flush: the last chunk per lane was never re-granted, so its
    # radiance still sits in acc
    fb = flush_acc(st, fb)
    segs = wrk_tot + jnp.sum(st.wrk)
    fb3 = fb[:drop].reshape(3, n_pix_loc).transpose(1, 0)
    return fb3, segs, iters, lane_steps


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _render_wqw_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                    spp: int, max_depth: int, attenuate: bool, t_min: float,
                    tile_rows: int, interpret: bool, window: int, chunk: int,
                    seed: jnp.ndarray):
    """Full-frame jit wrapper over wq_window_fb."""
    n_pix = width * height
    fb, segs, iters, lane_steps = wq_window_fb(
        scene, cam, width, height, n_pix_loc=n_pix, spp_loc=spp,
        chunk=chunk, window=window, max_depth=max_depth,
        attenuate=attenuate, t_min=t_min, tile_rows=tile_rows,
        interpret=interpret, seed=seed)
    img = (fb / jnp.float32(spp)).reshape(height, width, 3)
    return img, segs, iters, lane_steps


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _render_wqw_range_jit(scene: T.Scene, cam: Camera, width: int,
                          height: int, sc: int, max_depth: int,
                          attenuate: bool, t_min: float, tile_rows: int,
                          interpret: bool, window: int, chunk: int,
                          samp_base: jnp.ndarray, seed: jnp.ndarray):
    n_pix = width * height
    fb, _segs, _iters, _lane_steps = wq_window_fb(
        scene, cam, width, height, n_pix_loc=n_pix, spp_loc=sc,
        chunk=chunk, window=window, max_depth=max_depth,
        attenuate=attenuate, t_min=t_min, tile_rows=tile_rows,
        interpret=interpret, seed=seed, samp_base=samp_base)
    return fb


def render_wq_range(scene: T.Scene, cam: Camera, width: int, height: int,
                    samp_base: int, sc: int, *, max_depth: int = 50,
                    attenuate_emission: bool = False, t_min: float = 1e-3,
                    seed: int = 0, tile_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    window: Optional[int] = None) -> jnp.ndarray:
    """UNnormalized framebuffer sums (n_pix, 3) over samples
    [samp_base, samp_base + sc) of every pixel, through the production
    windowed work-queue megakernel — the accumulation quantum for
    checkpoint/resume (engine.checkpoint.render_checkpointed).  Streams are
    keyed on the global (pixel, sample) pair, so range sums compose
    deterministically: resuming at any range boundary reproduces an
    uninterrupted run with the same boundaries bit-for-bit."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = DEF_TILE_ROWS if not interpret else 8
    if window is None:
        window = DEF_WINDOW if not interpret else 3
    return _render_wqw_range_jit(
        scene, cam, width, height, int(sc), int(max_depth),
        bool(attenuate_emission), float(t_min), int(tile_rows),
        bool(interpret), int(window), pick_chunk(sc),
        jnp.int32(samp_base), jnp.uint32(seed))


def render_wq(scene: T.Scene, cam: Camera, width: int, height: int,
              spp: int, max_depth: int = 50,
              attenuate_emission: bool = False, t_min: float = 1e-3,
              seed: int = 0, tile_rows: Optional[int] = None,
              interpret: Optional[bool] = None,
              window: Optional[int] = None,
              return_stats: bool = False):
    """Render with the work-queue megakernel.  Output (H, W, 3), fb row 0 =
    image bottom (flip at save, main.cpp:41).  On CPU backends the kernel
    runs in pallas interpret mode (slow; tests only).

    `window` selects bounces per scatter/gather cycle: >1 = the windowed
    driver (production default), 1 = the legacy one-bounce driver (per-step
    gather+deposit).

    With return_stats: returns (img, traced_segments, bounce_iters,
    lane_steps); occupancy = traced_segments / lane_steps (the windowed
    driver narrows its grid during the drain, so lane_steps < iters *
    full_lane_count there)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = DEF_TILE_ROWS if not interpret else 8
    if window is None:
        window = DEF_WINDOW if not interpret else 3
    if window <= 1:
        img, segs, iters, lanes_f = _render_wq_jit(
            scene, cam, width, height, spp, max_depth,
            bool(attenuate_emission), float(t_min), int(tile_rows),
            bool(interpret), jnp.uint32(seed))
        lane_steps = iters.astype(jnp.float32) * lanes_f
    else:
        img, segs, iters, lane_steps = _render_wqw_jit(
            scene, cam, width, height, spp, max_depth,
            bool(attenuate_emission), float(t_min), int(tile_rows),
            bool(interpret), int(window), pick_chunk(spp),
            jnp.uint32(seed))
    if return_stats:
        return img, segs, iters, lane_steps
    return img
