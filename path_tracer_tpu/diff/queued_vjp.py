"""Production-speed gradients: QUEUE-driven record-and-replay custom VJP.

The r4 route (diff.pallas_vjp) records pixel-pinned lanes — one sample per
lane for max_depth bounces — and replays with ~50 per-lane gathers per
segment over ALL lanes.  At depth 50 with mean path ~2.7 that wastes ~95%
of lane-steps in the recording forward and pays the TPU's ~7.5 ns/element
serial random-access rate (docs/PERF_NOTES.md) tens of millions of times in
the replay: measured 0.07 Mray/s backward (docs/GRAD_BENCH.json r4).  This
module is the same estimator restructured around the two facts the rest of
this repo is built on:

* **Forward** = the production work-queue shape (engine.wq): lanes pull
  (pixel, sample-chunk) work from a global queue, the `wave_bounce`
  megakernel advances every live lane each step, finished chunks bank into
  per-lane slots and flush to the framebuffer once per window, and image
  texels ride the bounded texel service.  Residuals are recorded per STEP
  (not per path-depth), in TWO static stages: a full-width stage sized to
  drain the sample queue, then — mirroring wq's drain-stage narrowing —
  the surviving long paths are compacted 8x and traced on a narrow grid
  (the drain tail is ~3*max_depth steps at <5% live; running it full-width
  measured occupancy 0.45 vs 0.75 staged).  The compaction permutation is
  recorded so the replay can follow.
* **Backward** = `jax.vjp` of a differentiable REPLAY that reconstructs
  the framebuffer from the records: one nested `lax.scan` per stage over
  the recorded steps, re-deriving every continuous quantity along the
  recorded paths.  The winner's 48 attributes are fetched with a
  (lanes, R) one-hot **MXU matmul** against a scan-id-indexed attribute
  table — the TPU-idiomatic gather; zero per-lane random access in the
  loop.  Radiance banks into the recorder's own two per-lane deposit
  slots and flushes to the framebuffer once per window, so the replay's
  random access is O(n/window) scatter elements (its transpose is the
  matching gather) instead of the per-cell cotangent scatter a
  site-indexed proxy would need (~42 ms of the backward at the r5 bench
  config, measured — docs/PERF_NOTES.md's 7.5 ns/element law).  The
  window scans are rematerialized (jax.checkpoint): storing every
  per-step intermediate for the transpose measured 5x the forward's cost
  in HBM residual traffic; recomputing the cheap window body wins.
  Stage B (the drain) records with DENSE texel fixups — at drain width a
  full atlas gather is ~10 us/step, stalls would only stretch the
  path-length-bound tail that sets the floor-dominated step count.

The estimator is identical to pallas_vjp/the jnp route (detached sampling,
interior terms — docs/GRADIENTS.md): every discrete decision (winner id,
dielectric branch, medium acceptance, RNG draws) is pinned to the recorded
path; continuous quantities along it are differentiated.

Box sides share one scan id in the reference (box.hpp:20-25 builds 6 rects
as ONE hittable); the winner record can't name the side, so rect-class
table rows store the six axis-plane constants (min/max per axis via
scatter-min/max — a standalone rect degenerates to k==k on its axis) and
the replay picks the plane whose t matches the recorded t, attributing the
gradient to the side actually hit.  Material/texture columns are written
by one representative side only: a duplicate-index scatter-`set` would
hand EVERY duplicate the full cotangent (jax gathers the cell cotangent
per update) and overcount shared-parameter gradients 6x.

Reference semantics being differentiated: render.hpp:25-106,
material.hpp:11-131, sphere.hpp:59-106, rectangle.hpp:16-130,
triangle.hpp:58-100, constant_medium.hpp:28-77, camera.hpp:93-100,
texture.hpp:18-151.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..engine import wq as WQ
from ..engine.integrator import camera_rays
from ..scene import types as T
from ..ops.pallas import wave_bounce as WB

LANE = WB.LANE
SG = jax.lax.stop_gradient
f32 = jnp.float32

# Attribute-fetch formulation (see _replay_body).  "split3": bf16 one-hot
# against a 3-way bf16-split table — the one-hot is the fetch's real cost
# (its (lanes, R) materialization is pure HBM traffic, ~5.2 ns/lane-step
# in f32, measured), so halving it to bf16 and reconstructing f32 exactly
# from three bf16 planes (hi + mid + lo, the float-splitting trick; each
# one-hot row selects a single term, so the f32 accumulator sees no
# cancellation) beats Precision.HIGH on an f32 one-hot ~2x.  "high" keeps
# the r5.0 formulation for ablation.
FETCH_MODE = "split3"
MATMUL_PRECISION = jax.lax.Precision.HIGH
# rematerialize each replay window in the backward pass (True) vs store
# every per-step carry (False); see replay_fb
REPLAY_REMAT = True
# recorder inner-scan unroll (capped at `window`); the tunnel's per-call
# dispatch overhead scales with program size, so bigger is not always
# better at small configs
RECORD_UNROLL = 16


def _split3(tab: jnp.ndarray) -> jnp.ndarray:
    """(R, A) f32 -> (R, 3A) bf16 planes [hi | mid | lo] with
    hi + mid + lo == tab to f32 precision (24-bit significand = 3 x 8-bit
    bf16 mantissas)."""
    bf = jnp.bfloat16
    hi = tab.astype(bf)
    r1 = tab - hi.astype(jnp.float32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(jnp.float32)).astype(bf)
    return jnp.concatenate([hi, mid, lo], axis=1)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Recording work-queue forward (pallas megakernel, wq machinery)
# ---------------------------------------------------------------------------

class ResQ(NamedTuple):
    """Per-STEP records for one stage, all (S, lanes) f32 except texel
    (u32).

    win: ((term*4 + cls)*1024 + scan) + 1; 0 = lane did not advance
    (dead or stalled).  pix/s: the (pixel, sample) traced at this step
    (pre-kernel).  fresh: 1 where this step starts a new sample's path.
    fixk/texel: the image-texture fixup APPLIED at the start of this step
    (0 none / 1 albedo / 2 emit) and its resolved atlas texel."""
    pix: jnp.ndarray
    s: jnp.ndarray
    fresh: jnp.ndarray
    win: jnp.ndarray
    t: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    texel: jnp.ndarray
    fixk: jnp.ndarray


class RecQ(NamedTuple):
    """Two-stage recording: full-width stage `a`, drain stage `b` on
    lanes compacted through `perm` (i32 stage-A flat lane index per
    stage-B lane; `pvalid` masks real entries)."""
    a: ResQ
    b: ResQ
    perm: jnp.ndarray
    pvalid: jnp.ndarray


def rec_segments(rec: RecQ) -> jnp.ndarray:
    """Traced path segments in the recording (f32 scalar)."""
    return (jnp.sum((rec.a.win > 0).astype(f32))
            + jnp.sum((rec.b.win > 0).astype(f32)))


def record_forward_q(scene: T.Scene, cam: Camera, width: int, height: int,
                     pix_base, samp_base, *, npx: int, spp: int,
                     max_depth: int, attenuate: bool, t_min: float, seed,
                     rows: int, rows_b: int, tile_rows: int,
                     tile_rows_b: int, window: int, chunk: int,
                     n_windows: int, n_windows_b: int, interpret: bool,
                     dense_fix_b: bool = True, tail_pix: int = 0
                     ) -> Tuple[jnp.ndarray, RecQ, jnp.ndarray]:
    """Trace samples [samp_base, samp_base+spp) of pixels
    [pix_base, pix_base+npx) through the work-queue megakernel, recording
    per-step residuals.  Returns (fb (npx, 3) radiance SUMS over spp,
    RecQ, ok) — ok is False iff the static schedule could not finish the
    work (queue not drained, paths still alive at the end, or more
    survivors at the stage boundary than stage B's width; fb and gradients
    are then partial — raise the budgets).  Work order and RNG streams are
    the production wq driver's (chunk grants, pixel-major), so per-sample
    radiance matches engine.wq bit-for-bit up to deposit reassociation."""
    C = chunk
    cpp = spp // C
    assert cpp * C == spp, (spp, C)
    # Variable chunking: the last `tail_pix` pixels are granted as
    # SINGLE-sample chunks.  A C-sample chunk is a serial chain of up to
    # C*max_depth kernel steps on one lane (measured max 200 at C=4,
    # depth 50 on the final scene); chains granted near the queue's end
    # set the drain tail's length, which is pure floor-bound step count.
    # Splitting only the tail keeps the deposit amortization of big
    # chunks for ~95% of the work while capping the late chains at one
    # path.  Streams are keyed on (pixel, sample), so radiance is
    # bit-identical up to deposit reassociation (engine/wq.py work-order
    # note).
    tail_pix = min(int(tail_pix), npx)
    head_pix = npx - tail_pix
    head_chunks = head_pix * cpp
    n_chunks = head_chunks + tail_pix * spp
    pix_base_f = jnp.asarray(pix_base, f32)
    samp_base_f = jnp.asarray(samp_base, f32)

    tables = WB.pack_scene(scene)
    tables = tables._replace(
        cam=WB.pack_camera(cam, width, height),
        seed=jnp.asarray(seed).reshape(1).astype(jnp.uint32))
    atlas_flat, n_atlas = WQ._pack_atlas_flat(scene.textures.atlas)

    mkstep = lambda tr: functools.partial(
        WB.wave_bounce, t_min=t_min, max_depth=max_depth,
        attenuate=attenuate, tile_rows=tr, interpret=interpret)

    def refill(st: WB.WaveState, ex: WQ.WqwExtra, counter, fx: WB.FixState,
               lo=None):
        """wq_window_fb's chunk-grant refill (engine/wq.py): grant dead
        lanes the next pixel-major chunk, bank the finished chunk's
        accumulator into a free deposit slot.  `lo` = the drain stage's
        leftover-singles queue (lo_pix, lo_s, n_lo): chunk ids past the
        main queue map into it (see the stage boundary below)."""
        sh = st.ox.shape
        slot0_free = ex.bpix0 < 0.0
        slot1_free = ex.bpix1 < 0.0
        had_chunk = st.pix >= 0.0
        pend_emit = fx.kind == f32(WB.FIX_EMIT)
        dead = (st.alive <= 0.0) & jnp.logical_not(pend_emit)
        elig = dead & ((slot0_free | slot1_free)
                       | jnp.logical_not(had_chunk))
        elig_i = elig.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(elig_i) - elig_i
        n_total = n_chunks if lo is None else n_chunks + lo[2]
        navail = n_total - counter
        grant = (elig.reshape(-1) & (rank < navail)).reshape(sh)
        cid = counter + rank.reshape(sh)
        in_tail = cid >= head_chunks
        j = jnp.maximum(cid - head_chunks, 0)
        pix_new = pix_base_f + jnp.where(
            in_tail, head_pix + j // spp, cid // cpp).astype(f32)
        s0 = samp_base_f + jnp.where(
            in_tail, j % spp, (cid % cpp) * C).astype(f32)
        clen = jnp.where(in_tail, f32(1.0), f32(C))
        if lo is not None:
            lo_pix, lo_s, _ = lo
            in_lo = cid >= n_chunks
            li = jnp.clip(cid - n_chunks, 0, lo_pix.shape[0] - 1)
            pix_new = jnp.where(in_lo, lo_pix[li], pix_new)
            s0 = jnp.where(in_lo, lo_s[li], s0)
            clen = jnp.where(in_lo, f32(1.0), clen)

        pix_u = pix_new.reshape(-1).astype(jnp.uint32)
        s_u = s0.reshape(-1).astype(jnp.uint32)
        rng0 = rng_mod.splitmix32(
            pix_u ^ rng_mod.splitmix32(s_u ^ tables.seed[0]))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        rng1, o, d, tmv = camera_rays(cam, width, height, pix_u, rng0)

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
        zero = f32(0.0)
        one = f32(1.0)
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
            send=jnp.where(grant, s0 + clen, st.send),
            accx=jnp.where(grant, zero, st.accx),
            accy=jnp.where(grant, zero, st.accy),
            accz=jnp.where(grant, zero, st.accz),
        )
        n_grant = jnp.minimum(jnp.sum(elig_i), navail)
        return st, ex, counter + n_grant

    drop = 3 * npx
    npl = jnp.int32(npx)

    def plane_idx2d(bpix):
        valid = bpix >= 0.0
        base = (bpix - pix_base_f).astype(jnp.int32)
        mk = lambda c: jnp.where(valid, base + c * npl, drop)
        return mk(0), mk(1), mk(2)

    def deposit(ex: WQ.WqwExtra, fb):
        """Flush both bank slots ("2dsep" layout, engine/wq.py deposit)."""
        r0, g0, b0 = plane_idx2d(ex.bpix0)
        r1, g1, b1 = plane_idx2d(ex.bpix1)
        for i2, v2 in ((r0, ex.br0), (g0, ex.bg0), (b0, ex.bb0),
                       (r1, ex.br1), (g1, ex.bg1), (b1, ex.bb1)):
            fb = fb.at[i2].add(v2)
        neg = jnp.full_like(ex.bpix0, -1.0)
        z = jnp.zeros_like(ex.br0)
        return ex._replace(bpix0=neg, br0=z, bg0=z, bb0=z,
                           bpix1=neg, br1=z, bg1=z, bb1=z), fb

    def flush_acc(st: WB.WaveState, fb):
        valid = (st.pix >= 0.0).reshape(-1)
        base = (st.pix - pix_base_f).astype(jnp.int32).reshape(-1)
        idx = jnp.concatenate([jnp.where(valid, base + c * npl, drop)
                               for c in range(3)])
        vals = jnp.concatenate([st.accx.reshape(-1), st.accy.reshape(-1),
                                st.accz.reshape(-1)])
        return fb.at[idx].add(vals)

    def run_stage(carry0, fb, n_win, k0, step, dense_fix, lo=None):
        def bounce(carry, k):
            st, ex, counter, fx, ppix, ps = carry
            st, ex, counter = refill(st, ex, counter, fx, lo)
            rec_pix = st.pix
            rec_s = st.s
            fresh = ((rec_s != ps) | (rec_pix != ppix)) & (st.alive > 0.0)
            if dense_fix:
                idx = jnp.clip(fx.idx.astype(jnp.int32), 0, n_atlas - 1)
                texel = atlas_flat[idx]
                srv = jnp.ones_like(fx.kind)
            else:
                texel, srv = WQ.texel_service(fx, k, atlas_flat, n_atlas)
            fixk = fx.kind * srv
            d_in = (st.dx, st.dy, st.dz)
            out = step(tables, st, fix=fx, texel=texel, srv=srv)
            fx = WB.FixState(kind=out.fix_kind, idx=out.fix_idx,
                             fwx=out.fwx, fwy=out.fwy, fwz=out.fwz)
            rec = (rec_pix, rec_s, fresh.astype(f32), out.win, out.t_hit,
                   d_in[0], d_in[1], d_in[2], texel, fixk)
            return (out.state, ex, counter, fx, rec_pix, rec_s), rec

        def wbody(carry, w):
            st, ex, counter, fx, ppix, ps, fb = carry
            ks = k0 + w * jnp.int32(window) + jnp.arange(window,
                                                        dtype=jnp.int32)
            (st, ex, counter, fx, ppix, ps), recs = jax.lax.scan(
                bounce, (st, ex, counter, fx, ppix, ps), ks,
                unroll=1 if interpret else min(window, RECORD_UNROLL))
            ex, fb = deposit(ex, fb)
            return (st, ex, counter, fx, ppix, ps, fb), recs

        (st, ex, counter, fx, ppix, ps, fb), recs = jax.lax.scan(
            wbody, carry0 + (fb,), jnp.arange(n_win, dtype=jnp.int32))
        lanes = carry0[0].ox.size
        S = n_win * window
        flat = lambda a: a.reshape(S, lanes)
        res = ResQ(pix=flat(recs[0]), s=flat(recs[1]), fresh=flat(recs[2]),
                   win=flat(recs[3]), t=flat(recs[4]), dx=flat(recs[5]),
                   dy=flat(recs[6]), dz=flat(recs[7]), texel=flat(recs[8]),
                   fixk=flat(recs[9]))
        return (st, ex, counter, fx, ppix, ps), fb, res

    def compact(st, fx, ppix, ps, new_rows):
        """Pack live lanes (alive or pending fixup) into (new_rows, 128);
        acc must already be flushed.  Returns the compacted state + the
        permutation for the replay + the live count (overflow check)."""
        old = st.ox.size
        w = new_rows * LANE
        live = ((st.alive > 0.0) | (fx.kind != 0.0)).reshape(-1)
        live_i = live.astype(jnp.int32)
        rank = jnp.cumsum(live_i) - live_i
        tgt = jnp.where(live & (rank < w), rank, w)
        perm = jnp.zeros((w,), jnp.int32).at[tgt].set(
            jnp.arange(old, dtype=jnp.int32), mode="drop")
        nlive = jnp.sum(live_i)
        valid = (jnp.arange(w, dtype=jnp.int32) < nlive).reshape(
            new_rows, LANE)
        p2 = perm.reshape(new_rows, LANE)
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
        ppix2 = jnp.where(valid, g(ppix), neg1)
        ps2 = jnp.where(valid, g(ps), neg1)
        return st2, fx2, ppix2, ps2, perm, valid, nlive

    # ---- stage A: full width ---------------------------------------------
    sh = (rows, LANE)
    st0 = WQ._zeros_state(rows)
    st0 = st0._replace(s=jnp.full(sh, -1.0, f32),
                       pix=jnp.full(sh, -1.0, f32))
    ex0 = WQ._zeros_extra(rows)
    fx0 = WB.zero_fix(rows)
    fb = jnp.zeros((3 * npx + 1,), f32)
    neg = jnp.full(sh, -1.0, f32)
    carry = (st0, ex0, jnp.int32(0), fx0, neg, neg)
    carry, fb, res_a = run_stage(carry, fb, n_windows, jnp.int32(0),
                                 mkstep(tile_rows), False)
    st, ex, counter, fx, ppix, ps = carry

    # ---- boundary: flush + compact 8x ------------------------------------
    ex, fb = deposit(ex, fb)
    fb = flush_acc(st, fb)
    st, fx, ppix, ps, perm, pvalid, nlive = compact(st, fx, ppix, ps,
                                                    rows_b)
    ex_b = WQ._zeros_extra(rows_b)

    # ---- boundary: split surviving chunks --------------------------------
    # A surviving C-sample chunk is a serial chain of up to C*max_depth
    # further steps on ONE lane — the measured drain-tail length (chunk
    # chains max 200 steps at C=4, depth 50).  The current sample keeps
    # its lane; the chunk's not-yet-started samples re-queue as
    # single-sample grants any idle drain lane can pick up.  Streams are
    # keyed on (pixel, sample) (engine/wq.py work-order note), so
    # radiance is unchanged up to deposit reassociation.
    lo = None
    if C > 1:
        w_b = rows_b * LANE
        qcap = (C - 1) * w_b
        masks, pixs, svals = [], [], []
        valid_b = (st.s >= 0.0).reshape(-1)
        for jj in range(1, C):
            masks.append(valid_b & ((st.s + f32(jj)) < st.send).reshape(-1))
            pixs.append(st.pix.reshape(-1))
            svals.append((st.s + f32(jj)).reshape(-1))
        m_all = jnp.concatenate(masks)
        m_i = m_all.astype(jnp.int32)
        r = jnp.cumsum(m_i) - m_i
        tgt = jnp.where(m_all & (r < qcap), r, qcap)
        lo_pix = jnp.zeros((qcap + 1,), f32).at[tgt].set(
            jnp.concatenate(pixs), mode="drop")[:qcap]
        lo_s = jnp.zeros((qcap + 1,), f32).at[tgt].set(
            jnp.concatenate(svals), mode="drop")[:qcap]
        n_lo = jnp.sum(m_i)
        lo = (lo_pix, lo_s, n_lo)
        st = st._replace(send=jnp.where(st.s >= 0.0,
                                        jnp.minimum(st.send, st.s + 1.0),
                                        st.send))

    # ---- stage B: narrow drain -------------------------------------------
    carry = (st, ex_b, counter, fx, ppix, ps)
    carry, fb, res_b = run_stage(carry, fb, n_windows_b,
                                 jnp.int32(n_windows * window),
                                 mkstep(tile_rows_b), dense_fix_b, lo)
    st, ex, counter, fx, ppix, ps = carry
    ex, fb = deposit(ex, fb)
    fb = flush_acc(st, fb)

    n_work = n_chunks if lo is None else n_chunks + lo[2]
    ok = ((counter >= n_work)
          & jnp.logical_not(jnp.any(st.alive > 0.0))
          & jnp.all(fx.kind == 0.0)
          & (nlive <= rows_b * LANE))
    rec = RecQ(a=res_a, b=res_b, perm=perm,
               pvalid=pvalid.reshape(-1))
    fb3 = fb[:drop].reshape(3, npx).transpose(1, 0)
    return fb3, rec, ok


# ---------------------------------------------------------------------------
# Scan-indexed attribute table (the MXU "gather")
# ---------------------------------------------------------------------------

# Main-table column layout (A = 27).  Triangle and media geometry live in
# tiny per-class side tables (build_attr_table) fetched with their own
# (lanes, n_class) one-hots: the main fetch's MXU cost is lanes*R*3A and
# tris/media contribute few rows but 21 columns — moving them out shrank
# the dominant matmul 144 -> 81 split3 columns (~1.8x, measured r5).
# Rects stay in the main table: their six axis-plane constants are merged
# across box sides by scan id (scatter-min/max), which needs scan-indexed
# rows.
_C_SPH = 0     # c0x c0y c0z dcx dcy dcz t0 inv_dt radius           (0-8)
_C_RECT = 9    # x0 x1 y0 y1 z0 z1  (axis-plane constants/bounds)   (9-14)
_C_MAT = 15    # mtype param colx coly colz                         (15-19)
_C_TEX = 20    # ttype t1x t1y t1z t2x t2y t2z                      (20-26)
_A = 27
# tri side table: v0x v0y v0z e1x e1y e1z e2x e2y e2z               (0-8)
_A_TRI = 9
# media side table: btype cx cy cz r pmnx..pmnz pmxx..pmxz nid      (0-11)
_A_MED = 12


def _mat_cols(scene: T.Scene, mat_idx):
    """12 material/texture columns for a primitive array (differentiable
    small-table takes; runs once per backward, outside the scans)."""
    m = scene.materials
    tx = scene.textures
    take = lambda a: jnp.take(a, mat_idx, mode="clip")
    mtype = take(m.mtype).astype(f32)
    param = take(m.param)
    colx, coly, colz = take(m.color.x), take(m.color.y), take(m.color.z)
    tex = take(m.tex)
    tkt = lambda a: jnp.take(a, tex, mode="clip")
    ttype = tkt(tx.ttype).astype(f32)
    return [mtype, param, colx, coly, colz, ttype,
            tkt(tx.c1.x), tkt(tx.c1.y), tkt(tx.c1.z),
            tkt(tx.c2.x), tkt(tx.c2.y), tkt(tx.c2.z)]


def attr_table_rows(scene: T.Scene, attr_rows: int = None) -> int:
    """Static row count of the scan-indexed table.  The shape-derived
    bound counts PADDED per-class arrays; pass `attr_rows` (e.g. from
    `static_attr_rows` on a concrete scene) to tighten it — the fetch
    matmul is linear in R (640 -> 512 on the final scene)."""
    if attr_rows is not None:
        return min(1024, _round_up(max(attr_rows, LANE), LANE))
    n = (scene.spheres.radius.shape[0] + scene.rects.k.shape[0]
         + scene.triangles.scan.shape[0] + scene.media.r.shape[0])
    return min(1024, _round_up(max(n, LANE), LANE))


def static_attr_rows(scene: T.Scene) -> int:
    """max active scan id + 1 of a CONCRETE scene — the tight `attr_rows`
    hint for render_grad_fb (a static int; do not call under trace)."""
    import numpy as np
    m = 0
    for arr, act in ((scene.spheres.scan, scene.spheres.active),
                     (scene.rects.scan, scene.rects.active),
                     (scene.triangles.scan, scene.triangles.active),
                     (scene.media.scan, scene.media.active)):
        a = np.asarray(arr)[np.asarray(act)]
        if a.size:
            m = max(m, int(a.max()) + 1)
    return max(m, 1)


def build_attr_table(scene: T.Scene, attr_rows: int = None):
    """Winner-attribute tables indexed by GLOBAL scan id: the (R, 27)
    main table plus (n_tri, 9) / (n_med, 12) side tables with their scan
    id vectors (padded rows never match — their scan is the builder's
    2^30 sentinel).  Differentiable w.r.t. every float scene leaf read;
    `oh @ table` in the replay is the MXU gather and its transpose routes
    cotangents back into the scene pytree."""
    R = attr_table_rows(scene, attr_rows)
    tab = jnp.zeros((R + 1, _A), f32)      # row R = drop slot

    def rowset(tab, idx, col0, cols):
        block = jnp.stack(cols, axis=1)            # (n, len(cols))
        return jax.lax.dynamic_update_slice_in_dim(
            tab, tab[:, col0:col0 + block.shape[1]].at[idx].set(
                block, mode="drop"), col0, axis=1)

    sph = scene.spheres
    i_s = jnp.where(sph.active, jnp.clip(sph.scan, 0, R), R)
    dt = sph.time1 - sph.time0
    inv_dt = jnp.where(dt == 0.0, 0.0, 1.0 / jnp.where(dt == 0.0, 1.0, dt))
    tab = rowset(tab, i_s, _C_SPH,
                 [sph.c0.x, sph.c0.y, sph.c0.z,
                  sph.c1.x - sph.c0.x, sph.c1.y - sph.c0.y,
                  sph.c1.z - sph.c0.z, sph.time0, inv_dt, sph.radius])
    tab = rowset(tab, i_s, _C_MAT, _mat_cols(scene, sph.mat))

    # rects: per-axis plane constants via scatter-min/max (box sides share
    # the scan id; the replay picks the plane matching the recorded t).
    r = scene.rects
    i_r = jnp.where(r.active, jnp.clip(r.scan, 0, R), R)
    is_xy = r.axis == T.RECT_XY
    is_xz = r.axis == T.RECT_XZ
    is_yz = r.axis == T.RECT_YZ
    # global-axis extents of each rect: in-plane bounds + k on its own axis
    x0 = jnp.where(is_yz, r.k, r.a0)
    x1 = jnp.where(is_yz, r.k, r.a1)
    y0 = jnp.where(is_xz, r.k, jnp.where(is_xy, r.b0, r.a0))
    y1 = jnp.where(is_xz, r.k, jnp.where(is_xy, r.b1, r.a1))
    z0 = jnp.where(is_xy, r.k, r.b0)
    z1 = jnp.where(is_xy, r.k, r.b1)
    for j, (vlo, vhi) in enumerate(((x0, x1), (y0, y1), (z0, z1))):
        lo = jnp.full((R + 1,), jnp.inf, f32)
        hi = jnp.full((R + 1,), -jnp.inf, f32)
        cl = lo.at[i_r].min(vlo, mode="drop")
        ch = hi.at[i_r].max(vhi, mode="drop")
        cl = jnp.where(jnp.isfinite(cl), cl, 0.0)
        ch = jnp.where(jnp.isfinite(ch), ch, 0.0)
        tab = jax.lax.dynamic_update_slice_in_dim(
            tab, cl[:, None], _C_RECT + 2 * j, axis=1)
        tab = jax.lax.dynamic_update_slice_in_dim(
            tab, ch[:, None], _C_RECT + 2 * j + 1, axis=1)
    # material columns from ONE representative side (duplicate scatter-set
    # indices would hand every duplicate the full cotangent: 6x overcount)
    i_r_rep = jnp.where(r.active & (r.sub == 0), jnp.clip(r.scan, 0, R), R)
    tab = rowset(tab, i_r_rep, _C_MAT, _mat_cols(scene, r.mat))

    tr = scene.triangles
    i_t = jnp.where(tr.active, jnp.clip(tr.scan, 0, R), R)
    tab = rowset(tab, i_t, _C_MAT, _mat_cols(scene, tr.mat))
    tri_tab = jnp.stack(
        [tr.v0.x, tr.v0.y, tr.v0.z,
         tr.v1.x - tr.v0.x, tr.v1.y - tr.v0.y, tr.v1.z - tr.v0.z,
         tr.v2.x - tr.v0.x, tr.v2.y - tr.v0.y, tr.v2.z - tr.v0.z], axis=1)
    tri_ids = jnp.where(tr.active, tr.scan, -1).astype(jnp.int32)

    md = scene.media
    i_m = jnp.where(md.active, jnp.clip(md.scan, 0, R), R)
    tab = rowset(tab, i_m, _C_MAT, _mat_cols(scene, md.mat))
    med_tab = jnp.stack(
        [md.btype.astype(f32), md.c.x, md.c.y, md.c.z, md.r,
         md.pmin.x, md.pmin.y, md.pmin.z,
         md.pmax.x, md.pmax.y, md.pmax.z, md.neg_inv_density], axis=1)
    med_ids = jnp.where(md.active, md.scan, -1).astype(jnp.int32)

    return tab[:R], tri_tab, tri_ids, med_tab, med_ids


# ---------------------------------------------------------------------------
# Differentiable scan replay
# ---------------------------------------------------------------------------

def _replay_body(tab, tri_tab, tri_ids, med_tab, med_ids, iota_r, cam,
                 width, height, seed_u, max_depth, attenuate, t_min):
    """One recorded step for every lane — winner-only, differentiable.
    Shape-agnostic: operates on whatever (lanes,) slices the stage scan
    feeds it.  Radiance accumulates per lane (ax/ay/az, the replay's
    st.acc*) and banks into the two per-lane deposit slots (b0*/b1*) when
    the lane's pixel changes — the recorder's refill only grants with a
    free slot and flushes both every window, so two slots never overflow
    here either (engine/wq.py refill)."""
    inv255 = f32(1.0 / 255.0)

    def body(carry, xs):
        (ox, oy, oz, dx, dy, dz, tm, tpx, tpy, tpz,
         pex, pey, pez, ax, ay, az, ppix,
         b0p, b0r, b0g, b0b, b1p, b1r, b1g, b1b) = carry
        (pix, s, fresh, win, t_rec_, dnx_, dny_, dnz_, texel_, fixk) = xs
        t_rec = SG(t_rec_)
        d_next = (SG(dnx_), SG(dny_), SG(dnz_))
        texel = SG(texel_)
        frs = fresh > 0.0

        # ---- pixel change: bank the finished chunk's radiance ------------
        pixc = pix != ppix
        bank = pixc & (ppix >= 0.0)
        slot0_free = b0p < 0.0
        use0 = bank & slot0_free
        use1 = bank & jnp.logical_not(slot0_free)
        b0p = jnp.where(use0, ppix, b0p)
        b0r = jnp.where(use0, ax, b0r)
        b0g = jnp.where(use0, ay, b0g)
        b0b = jnp.where(use0, az, b0b)
        b1p = jnp.where(use1, ppix, b1p)
        b1r = jnp.where(use1, ax, b1r)
        b1g = jnp.where(use1, ay, b1g)
        b1b = jnp.where(use1, az, b1b)
        zf = jnp.zeros_like(ax)
        ax = jnp.where(pixc, zf, ax)
        ay = jnp.where(pixc, zf, ay)
        az = jnp.where(pixc, zf, az)

        # ---- fresh path start: differentiable camera ray -----------------
        pix_u = jnp.clip(pix, 0.0, None).astype(jnp.uint32)
        s_u = jnp.clip(s, 0.0, None).astype(jnp.uint32)
        rng0 = rng_mod.splitmix32(pix_u ^ rng_mod.splitmix32(s_u ^ seed_u))
        rng0 = jnp.where(rng0 == 0, jnp.uint32(rng_mod.INITIAL_STATE), rng0)
        _, o0, d0, tm0 = camera_rays(cam, width, height, pix_u, rng0)
        sel = lambda new, old: jnp.where(frs, new, old)
        ox, oy, oz = sel(o0.x, ox), sel(o0.y, oy), sel(o0.z, oz)
        dx, dy, dz = sel(d0.x, dx), sel(d0.y, dy), sel(d0.z, dz)
        tm = sel(tm0, tm)
        one = jnp.ones_like(ox)
        tpx, tpy, tpz = sel(one, tpx), sel(one, tpy), sel(one, tpz)

        # ---- apply this step's image-texture fixup (texture.hpp:144-150) -
        txr = (texel & 0xFF).astype(f32) * inv255
        txg = ((texel >> 8) & 0xFF).astype(f32) * inv255
        txb = ((texel >> 16) & 0xFF).astype(f32) * inv255
        is_alb_fix = fixk == f32(WB.FIX_ALBEDO)
        is_emit_fix = fixk == f32(WB.FIX_EMIT)
        tpx = jnp.where(is_alb_fix, tpx * txr, tpx)
        tpy = jnp.where(is_alb_fix, tpy * txg, tpy)
        tpz = jnp.where(is_alb_fix, tpz * txb, tpz)
        ax = ax + jnp.where(is_emit_fix, pex * txr, 0.0)
        ay = ay + jnp.where(is_emit_fix, pey * txg, 0.0)
        az = az + jnp.where(is_emit_fix, pez * txb, 0.0)

        # ---- decode the winner record ------------------------------------
        live = win > 0.0
        enc = jnp.maximum(win - 1.0, 0.0)
        term = jnp.floor(enc * f32(1.0 / 4096.0))
        rem = enc - term * 4096.0
        cls = jnp.floor(rem * f32(1.0 / 1024.0))
        scan = SG((rem - cls * 1024.0).astype(jnp.int32))
        hit = live & (term != 1.0)
        cont = live & (term == 0.0)
        is_s = hit & (cls == 0.0)
        is_r = hit & (cls == 1.0)
        is_t = hit & (cls == 2.0)
        is_m = hit & (cls == 3.0)

        # ---- winner attributes: ONE one-hot MXU matmul -------------------
        # A single-pass bf16 matmul on an f32 table ROUNDS every fetched
        # attribute (0.6 -> 0.6015625, a +0.26% radiance bias, measured);
        # FETCH_MODE picks how full f32 values are reconstructed (see the
        # module constants).  `tab` here is the pre-split (R, 3A) bf16
        # table under "split3", the raw (R, A) f32 table under "high".
        if FETCH_MODE == "split3":
            oh = (scan[:, None] == iota_r[None, :]).astype(jnp.bfloat16)
            prod = jnp.dot(oh, tab, preferred_element_type=f32)
            at = prod[:, :_A] + prod[:, _A:2 * _A] + prod[:, 2 * _A:]
        else:
            oh = (scan[:, None] == iota_r[None, :]).astype(f32)
            at = jnp.dot(oh, tab, preferred_element_type=f32,
                         precision=MATMUL_PRECISION)    # (lanes, 27)
        col = lambda j: at[:, j]
        # tri/media side tables: few rows, so exact f32 one-hot matmuls
        # are noise next to the main fetch (HIGHEST = full-f32 passes)
        oh_t = (scan[:, None] == tri_ids[None, :]).astype(f32)
        at_t = jnp.dot(oh_t, tri_tab, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
        colt = lambda j: at_t[:, j]
        oh_m = (scan[:, None] == med_ids[None, :]).astype(f32)
        at_m = jnp.dot(oh_m, med_tab, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
        colm = lambda j: at_m[:, j]

        a = dx * dx + dy * dy + dz * dz
        a_safe = jnp.where(a == 0.0, 1.0, a)
        inv_len = jax.lax.rsqrt(a_safe)
        udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len

        # sphere (moving center at tm; sphere.hpp:26-117)
        frac = (tm - col(_C_SPH + 6)) * col(_C_SPH + 7)
        cx = col(_C_SPH + 0) + frac * col(_C_SPH + 3)
        cy = col(_C_SPH + 1) + frac * col(_C_SPH + 4)
        cz = col(_C_SPH + 2) + frac * col(_C_SPH + 5)
        srad = col(_C_SPH + 8)
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - srad * srad
        disc = b * b - a_safe * cc
        pos = SG(disc > 0.0)
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos.astype(f32)
        k1 = (-b - sq) / a_safe
        k2 = (-b + sq) / a_safe
        pick1 = SG(jnp.abs(k1 - t_rec) <= jnp.abs(k2 - t_rec))
        t_sph = jnp.where(pick1, k1, k2)

        # rect/box: pick the axis plane whose t matches the record
        t_rect = jnp.zeros_like(a)
        best = jnp.full_like(a, jnp.inf)
        n_rx = jnp.zeros_like(a)
        n_ry = jnp.zeros_like(a)
        n_rz = jnp.zeros_like(a)
        for j, (ov, dv) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
            dv_ = jnp.where(dv == 0.0, 1.0, dv)
            for side in (0, 1):
                kk = col(_C_RECT + 2 * j + side)
                tt_ = (kk - ov) / dv_
                dlt = SG(jnp.abs(tt_ - t_rec))
                upd = SG(dlt < best)
                best = jnp.where(upd, dlt, best)
                t_rect = jnp.where(upd, tt_, t_rect)
                n_rx = jnp.where(upd, f32(1.0 if j == 0 else 0.0), n_rx)
                n_ry = jnp.where(upd, f32(1.0 if j == 1 else 0.0), n_ry)
                n_rz = jnp.where(upd, f32(1.0 if j == 2 else 0.0), n_rz)

        # triangle (Moller-Trumbore; triangle.hpp:58-100)
        v0x, v0y, v0z = colt(0), colt(1), colt(2)
        e1x, e1y, e1z = colt(3), colt(4), colt(5)
        e2x, e2y, e2z = colt(6), colt(7), colt(8)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det = jnp.where(det == 0.0, 1.0, det)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) / det

        # medium event (constant_medium.hpp:28-77): t = t1c + nid*logu/|d|
        mb = SG(colm(0))
        mcx, mcy, mcz = colm(1), colm(2), colm(3)
        mr = colm(4)
        mocx, mocy, mocz = ox - mcx, oy - mcy, oz - mcz
        mbq = mocx * dx + mocy * dy + mocz * dz
        mcc = mocx * mocx + mocy * mocy + mocz * mocz - mr * mr
        mdisc = mbq * mbq - a_safe * mcc
        mpos = SG(mdisc > 0.0)
        msq = jnp.sqrt(jnp.where(mpos, mdisc, 1.0)) * mpos.astype(f32)
        ment_s = (-mbq - msq) / a_safe
        pmnx, pmny, pmnz = colm(5), colm(6), colm(7)
        pmxx, pmxy, pmxz = colm(8), colm(9), \
            colm(10)
        ent_b = jnp.full_like(a, jnp.inf)
        for kk_, ov, dv, oav, dav, a0_, a1_, obv, dbv, b0_, b1_ in (
            (pmxz, oz, dz, ox, dx, pmnx, pmxx, oy, dy, pmny, pmxy),
            (pmnz, oz, dz, ox, dx, pmnx, pmxx, oy, dy, pmny, pmxy),
            (pmxy, oy, dy, ox, dx, pmnx, pmxx, oz, dz, pmnz, pmxz),
            (pmny, oy, dy, ox, dx, pmnx, pmxx, oz, dz, pmnz, pmxz),
            (pmxx, ox, dx, oy, dy, pmny, pmxy, oz, dz, pmnz, pmxz),
            (pmnx, ox, dx, oy, dy, pmny, pmxy, oz, dz, pmnz, pmxz),
        ):
            dv_ = jnp.where(dv == 0.0, 1.0, dv)
            tt_ = (kk_ - ov) / dv_
            av = oav + tt_ * dav
            bv = obv + tt_ * dbv
            okb = SG((av >= a0_) & (av <= a1_) & (bv >= b0_) & (bv <= b1_)
                     & (dv != 0.0))
            ent_b = jnp.minimum(ent_b, jnp.where(okb, tt_, jnp.inf))
        ment = jnp.where(mb == f32(T.MED_BOUND_BOX), ent_b, ment_s)
        t1c = jnp.maximum(jnp.maximum(ment, f32(t_min)), 0.0)
        t1c = jnp.where(jnp.isfinite(t1c), t1c, 0.0)
        ray_len = jnp.sqrt(a_safe)
        nid = colm(11)
        nid_safe = jnp.where(nid == 0.0, -1.0, nid)
        logu = SG((t_rec - t1c) * ray_len / nid_safe)
        t_med = t1c + nid_safe * logu * inv_len

        t_hit = jnp.where(is_s, t_sph, jnp.where(is_r, t_rect, jnp.where(
            is_t, t_tri, t_med)))
        t_hit = jnp.where(hit, t_hit, 0.0)
        px_ = ox + t_hit * dx
        py_ = oy + t_hit * dy
        pz_ = oz + t_hit * dz

        # normal (front-flipped with the recorded orientation)
        srad_safe = jnp.where(srad == 0.0, 1.0, srad)
        n_sx = (px_ - cx) / srad_safe
        n_sy = (py_ - cy) / srad_safe
        n_sz = (pz_ - cz) / srad_safe
        n_tx = e1y * e2z - e1z * e2y
        n_ty = e1z * e2x - e1x * e2z
        n_tz = e1x * e2y - e1y * e2x
        nx = jnp.where(is_s, n_sx, jnp.where(is_r, n_rx, jnp.where(
            is_t, n_tx, 1.0)))
        ny = jnp.where(is_s, n_sy, jnp.where(is_r, n_ry, jnp.where(
            is_t, n_ty, 0.0)))
        nz = jnp.where(is_s, n_sz, jnp.where(is_r, n_rz, jnp.where(
            is_t, n_tz, 0.0)))
        front = SG(is_m | ((dx * nx + dy * ny + dz * nz) < 0.0))
        fsign = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = nx * fsign, ny * fsign, nz * fsign

        # ---- winner material + albedo (material.hpp, texture.hpp) --------
        mtype = SG(col(_C_MAT + 0))
        mpar = col(_C_MAT + 1)
        mcolx, mcoly, mcolz = col(_C_MAT + 2), col(_C_MAT + 3), \
            col(_C_MAT + 4)
        ttype = SG(col(_C_TEX + 0))
        is_lam = mtype == f32(T.MAT_LAMBERTIAN)
        is_metal = mtype == f32(T.MAT_METAL)
        is_diel = mtype == f32(T.MAT_DIELECTRIC)
        is_light = mtype == f32(T.MAT_LIGHT)
        is_plain = is_metal | is_diel
        is_img = (ttype == f32(T.TEX_IMAGE)) & jnp.logical_not(is_plain)
        is_chk = (ttype == f32(T.TEX_CHECKER)) & jnp.logical_not(is_plain)

        odd = SG(jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                 * jnp.sin(10.0 * pz_) < 0.0)
        alb_x = jnp.where(is_chk, jnp.where(odd, col(_C_TEX + 1),
                                            col(_C_TEX + 4)),
                          col(_C_TEX + 1))
        alb_y = jnp.where(is_chk, jnp.where(odd, col(_C_TEX + 2),
                                            col(_C_TEX + 5)),
                          col(_C_TEX + 2))
        alb_z = jnp.where(is_chk, jnp.where(odd, col(_C_TEX + 3),
                                            col(_C_TEX + 6)),
                          col(_C_TEX + 3))
        alb_x = jnp.where(is_plain, mcolx, jnp.where(is_img, 1.0, alb_x))
        alb_y = jnp.where(is_plain, mcoly, jnp.where(is_img, 1.0, alb_y))
        alb_z = jnp.where(is_plain, mcolz, jnp.where(is_img, 1.0, alb_z))

        # ---- scatter reconstruction (detached draws) ---------------------
        ud_dot_n = udx * nx + udy * ny + udz * nz
        rfl_x = udx - 2.0 * ud_dot_n * nx
        rfl_y = udy - 2.0 * ud_dot_n * ny
        rfl_z = udz - 2.0 * ud_dot_n * nz

        # lambertian: d' = n + unit (unit detached from the record)
        ulx = d_next[0] - SG(nx)
        uly = d_next[1] - SG(ny)
        ulz = d_next[2] - SG(nz)
        dl_x, dl_y, dl_z = nx + ulx, ny + uly, nz + ulz

        # metal: d' = reflect + fuzz * ball
        fz = mpar
        fz_safe = SG(jnp.where(fz == 0.0, 1.0, fz))
        bx = SG((d_next[0] - rfl_x) / fz_safe)
        by = SG((d_next[1] - rfl_y) / fz_safe)
        bz = SG((d_next[2] - rfl_z) / fz_safe)
        dm_x, dm_y, dm_z = rfl_x + fz * bx, rfl_y + fz * by, rfl_z + fz * bz

        # dielectric: pinned branch, refract differentiable in ior/n
        ior = jnp.where(is_diel, mpar, 1.5)
        ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-ud_dot_n, 1.0)
        chose_reflect = SG(
            (d_next[0] * nx + d_next[1] * ny + d_next[2] * nz) > 0.0)
        rp_x = (udx + cos_t * nx) * ratio
        rp_y = (udy + cos_t * ny) * ratio
        rp_z = (udz + cos_t * nz) * ratio
        rp_sq = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
        rps = jnp.abs(1.0 - rp_sq)
        rpos = SG(rps > 0.0)
        rpar_ = -jnp.sqrt(jnp.where(rpos, rps, 1.0)) * rpos.astype(f32)
        rr_x = rp_x + rpar_ * nx
        rr_y = rp_y + rpar_ * ny
        rr_z = rp_z + rpar_ * nz
        dd_x = jnp.where(chose_reflect, rfl_x, rr_x)
        dd_y = jnp.where(chose_reflect, rfl_y, rr_y)
        dd_z = jnp.where(chose_reflect, rfl_z, rr_z)

        nd_x = jnp.where(is_lam, dl_x, jnp.where(is_metal, dm_x, jnp.where(
            is_diel, dd_x, d_next[0])))
        nd_y = jnp.where(is_lam, dl_y, jnp.where(is_metal, dm_y, jnp.where(
            is_diel, dd_y, d_next[1])))
        nd_z = jnp.where(is_lam, dl_z, jnp.where(is_metal, dm_z, jnp.where(
            is_diel, dd_z, d_next[2])))

        # ---- terminal contributions into the lane accumulator ------------
        sky_tv = 0.5 * (udy + 1.0)
        skyx = 1.0 - sky_tv + sky_tv * f32(0.5)
        skyy = 1.0 - sky_tv + sky_tv * f32(0.7)
        skyz = 1.0 - sky_tv + sky_tv * f32(1.0)
        miss = live & (term == 1.0)
        stop_em = live & (term == 2.0)
        if attenuate:
            ewx, ewy, ewz = tpx, tpy, tpz
        else:
            ewx = ewy = ewz = jnp.ones_like(tpx)
        ax = ax + jnp.where(miss, tpx * skyx, 0.0)
        ay = ay + jnp.where(miss, tpy * skyy, 0.0)
        az = az + jnp.where(miss, tpz * skyz, 0.0)
        emit_now = stop_em & jnp.logical_not(is_img)
        ax = ax + jnp.where(emit_now, ewx * alb_x, 0.0)
        ay = ay + jnp.where(emit_now, ewy * alb_y, 0.0)
        az = az + jnp.where(emit_now, ewz * alb_z, 0.0)
        # image-texture emission defers to the step its texel is serviced
        emit_pend = stop_em & is_img
        pex = jnp.where(emit_pend, ewx, pex)
        pey = jnp.where(emit_pend, ewy, pey)
        pez = jnp.where(emit_pend, ewz, pez)

        # ---- advance the continuing path ---------------------------------
        att_x = jnp.where(is_light | is_img, 1.0, alb_x)
        att_y = jnp.where(is_light | is_img, 1.0, alb_y)
        att_z = jnp.where(is_light | is_img, 1.0, alb_z)
        tpx = jnp.where(cont, tpx * att_x, tpx)
        tpy = jnp.where(cont, tpy * att_y, tpy)
        tpz = jnp.where(cont, tpz * att_z, tpz)
        ox = jnp.where(cont, px_, ox)
        oy = jnp.where(cont, py_, oy)
        oz = jnp.where(cont, pz_, oz)
        dx = jnp.where(cont, nd_x, dx)
        dy = jnp.where(cont, nd_y, dy)
        dz = jnp.where(cont, nd_z, dz)
        return (ox, oy, oz, dx, dy, dz, tm, tpx, tpy, tpz,
                pex, pey, pez, ax, ay, az, pix,
                b0p, b0r, b0g, b0b, b1p, b1r, b1g, b1b), None

    return body


def _zeros_carry(lanes):
    z = jnp.zeros((lanes,), f32)
    one = jnp.ones((lanes,), f32)
    neg = jnp.full((lanes,), -1.0, f32)
    return (z, z, z, z, z, one, z, one, one, one,
            z, z, z, z, z, z, neg,
            neg, z, z, z, neg, z, z, z)


def replay_fb(scene: T.Scene, cam: Camera, rec: RecQ, pix_base, *,
              width: int, height: int, npx: int, max_depth: int,
              attenuate: bool, t_min: float, seed, window: int,
              unroll: int = 4, attr_rows: int = None) -> jnp.ndarray:
    """Differentiable reconstruction of the recorded forward's
    UNnormalized radiance sums (npx, 3): replays every recorded step and
    deposits through the recorder's own window-banked slots.  Its
    `jax.vjp` with the image cotangent IS the render's backward — no
    per-cell cotangent placement pass (the site-scatter alternative
    measured 42 ms at the r5 bench config, pure 7.5 ns/element random
    access).  Windows align with the recorder's (same `window`), so the
    two bank slots cannot overflow (refill grants only with a free
    slot)."""
    tab, tri_tab, tri_ids, med_tab, med_ids = build_attr_table(
        scene, attr_rows)
    R = tab.shape[0]
    if FETCH_MODE == "split3":
        tab = _split3(tab)     # inside the vjp: cotangents flow through
    iota_r = jnp.arange(R, dtype=jnp.int32)
    seed_u = jnp.asarray(seed).astype(jnp.uint32)
    body = _replay_body(tab, tri_tab, tri_ids, med_tab, med_ids, iota_r,
                        cam, width, height, seed_u, max_depth, attenuate,
                        t_min)
    pix_base_f = jnp.asarray(pix_base, f32)
    npl = jnp.int32(npx)
    drop = 3 * npx

    def idx3(bp):
        valid = bp >= 0.0
        base = (bp - pix_base_f).astype(jnp.int32)
        return [jnp.where(valid, base + c * npl, drop) for c in range(3)]

    def flush_slots(carry, fb):
        b0p, b0r, b0g, b0b, b1p, b1r, b1g, b1b = carry[17:25]
        i0 = idx3(b0p)
        i1 = idx3(b1p)
        for i2, v2 in ((i0[0], b0r), (i0[1], b0g), (i0[2], b0b),
                       (i1[0], b1r), (i1[1], b1g), (i1[2], b1b)):
            fb = fb.at[i2].add(v2)
        neg = jnp.full_like(b0p, -1.0)
        z = jnp.zeros_like(b0r)
        return carry[:17] + (neg, z, z, z, neg, z, z, z), fb

    def flush_acc(carry, fb):
        ax, ay, az, ppix = carry[13], carry[14], carry[15], carry[16]
        valid = ppix >= 0.0
        base = (ppix - pix_base_f).astype(jnp.int32)
        idx = jnp.concatenate([jnp.where(valid, base + c * npl, drop)
                               for c in range(3)])
        fb = fb.at[idx].add(jnp.concatenate([ax, ay, az]))
        z = jnp.zeros_like(ax)
        return carry[:13] + (z, z, z) + carry[16:], fb

    def run_stage(carry0, fb, res: ResQ, dn, lanes):
        xs = (res.pix, res.s, res.fresh, res.win, res.t,
              dn[0], dn[1], dn[2], res.texel, res.fixk)
        n_win = res.win.shape[0] // window
        xs_w = tuple(x.reshape(n_win, window, lanes) for x in xs)

        def win_scan(carry, xw):
            carry, _ = jax.lax.scan(body, carry, xw, unroll=unroll)
            return carry
        if REPLAY_REMAT:
            win_scan = jax.checkpoint(win_scan, prevent_cse=False)

        def wbody(cfb, xw):
            carry, fb = cfb
            carry = win_scan(carry, xw)
            carry, fb = flush_slots(carry, fb)
            return (carry, fb), None

        (carry, fb), _ = jax.lax.scan(wbody, (carry0, fb), xs_w)
        return carry, fb

    a, bres = rec.a, rec.b
    lanes_a = a.win.shape[1]
    lanes_b = bres.win.shape[1]

    # stage-A next-step directions: shifted within A; the LAST A step's
    # continuations survive into stage B — their next direction is stage
    # B's first recorded direction, mapped back through the permutation.
    pv = rec.pvalid
    bidx = jnp.where(pv, rec.perm, lanes_a)   # invalid -> drop slot
    back = lambda v: jnp.zeros((lanes_a + 1,), f32).at[bidx].set(
        v, mode="drop")[:lanes_a]
    dnx_a = jnp.concatenate([a.dx[1:], back(bres.dx[0])[None]], axis=0)
    dny_a = jnp.concatenate([a.dy[1:], back(bres.dy[0])[None]], axis=0)
    dnz_a = jnp.concatenate([a.dz[1:], back(bres.dz[0])[None]], axis=0)

    fb = jnp.zeros((3 * npx + 1,), f32)
    carry_a, fb = run_stage(_zeros_carry(lanes_a), fb, a,
                            (dnx_a, dny_a, dnz_a), lanes_a)
    # boundary: flush every lane's accumulator (recorder's flush_acc),
    # then gather the surviving lanes' carries through the permutation
    carry_a, fb = flush_acc(carry_a, fb)
    defaults = _zeros_carry(lanes_b)
    gth = lambda v, dflt: jnp.where(pv, v[rec.perm], dflt)
    carry_b0 = (tuple(gth(v, d) for v, d in zip(carry_a[:13],
                                                defaults[:13]))
                + defaults[13:16]
                + (gth(carry_a[16], defaults[16]),)
                + defaults[17:])

    dnx_b = jnp.concatenate([bres.dx[1:], bres.dx[-1:]], axis=0)
    dny_b = jnp.concatenate([bres.dy[1:], bres.dy[-1:]], axis=0)
    dnz_b = jnp.concatenate([bres.dz[1:], bres.dz[-1:]], axis=0)
    carry_b, fb = run_stage(carry_b0, fb, bres, (dnx_b, dny_b, dnz_b),
                            lanes_b)
    _, fb = flush_acc(carry_b, fb)
    return fb[:drop].reshape(3, npx).transpose(1, 0)


# ---------------------------------------------------------------------------
# custom_vjp glue
# ---------------------------------------------------------------------------

def render_grad_fb(width: int, height: int, npx: int, spp: int, *,
                   max_depth: int = 8, attenuate: bool = True,
                   t_min: float = 1e-3, seed: int = 0,
                   rows: int = None, rows_b: int = None,
                   tile_rows: int = None, tile_rows_b: int = None,
                   window: int = None, chunk: int = None,
                   max_steps: int = None, max_steps_b: int = None,
                   avg_path_hint: float = 3.0, interpret: bool = None,
                   attr_rows: int = None, tail_pix: int = None):
    """Build `f(scene, cam, pix_base, samp_base) -> (npx, 3)` per-pixel
    MEAN radiance over samples [samp_base, samp_base+spp) of the
    contiguous pixel range [pix_base, pix_base+npx): forward runs the
    recording work-queue megakernel, backward the one-hot-MXU scan replay.
    pix_base/samp_base are traced scalars so one compiled `f` serves every
    shard of a shard_map training step (parallel.mesh.make_train_step).

    The recording schedule is STATIC: `max_steps` full-width steps (sized
    from `avg_path_hint` mean segments per path) drain the sample queue,
    then the surviving long paths run `max_steps_b` steps on a `rows_b`
    grid (default rows/8).  If a scene's true mean path exceeds the hint,
    the queue does not drain and fb/gradients are partial —
    `record_forward_q`'s ok flag (exposed for tests and the bench) detects
    this; raise `avg_path_hint` or pass `max_steps`/`max_steps_b`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = 8 if interpret else 32
    if chunk is None:
        chunk = WQ.pick_chunk(spp, cap=8)
    if window is None:
        window = max(4, min(16, 4 * chunk))
    L = npx * spp
    if rows is None:
        rows = min(128, max(tile_rows,
                            _round_up(-(-L // (LANE * 5)), tile_rows)))
    if tile_rows_b is None:
        tile_rows_b = min(8, tile_rows)
    if rows_b is None:
        rows_b = max(tile_rows_b, rows // 16)
    rows_b = _round_up(rows_b, tile_rows_b)
    lanes = rows * LANE
    if tail_pix is None:
        # singles cover ~the last window's worth of grants (see
        # record_forward_q's variable-chunking note); irrelevant when
        # chunks are already single-sample
        tail_pix = 0 if chunk == 1 else min(npx // 2, lanes // 2)
    if max_steps is None:
        max_steps = (int(math.ceil(L * avg_path_hint / (lanes * 0.85)))
                     + 2 * window)
    if max_steps_b is None:
        max_steps_b = 3 * max_depth + 2 * window
    n_windows = -(-max_steps // window)
    n_windows_b = -(-max_steps_b // window)
    cfg = dict(npx=npx, spp=spp, max_depth=max_depth, attenuate=attenuate,
               t_min=t_min, seed=seed, rows=rows, rows_b=rows_b,
               tile_rows=tile_rows, tile_rows_b=tile_rows_b, window=window,
               chunk=chunk, n_windows=n_windows, n_windows_b=n_windows_b,
               interpret=interpret, tail_pix=int(tail_pix))
    inv_spp = f32(1.0 / spp)

    @jax.custom_vjp
    def f(scene, cam, pix_base, samp_base):
        fb, _, _ = record_forward_q(scene, cam, width, height, pix_base,
                                    samp_base, **cfg)
        return fb * inv_spp

    def fwd(scene, cam, pix_base, samp_base):
        fb, rec, _ = record_forward_q(scene, cam, width, height, pix_base,
                                      samp_base, **cfg)
        return fb * inv_spp, (scene, cam, rec, pix_base, samp_base)

    def bwd(saved, gbar):
        scene, cam, rec, pix_base, samp_base = saved
        _, vjp_fn = jax.vjp(
            lambda s, c: replay_fb(
                s, c, rec, pix_base, width=width, height=height, npx=npx,
                max_depth=max_depth, attenuate=attenuate, t_min=t_min,
                seed=seed, window=window, unroll=1 if interpret else 16,
                attr_rows=attr_rows),
            scene, cam)
        ds, dc = vjp_fn(gbar * inv_spp)
        return ds, dc, jnp.zeros_like(jnp.asarray(pix_base, f32)), \
            jnp.zeros_like(jnp.asarray(samp_base, f32))

    f.defvjp(fwd, bwd)
    f.cfg = dict(cfg, width=width, height=height)   # introspection/tests
    return f
