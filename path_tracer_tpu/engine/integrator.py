"""Wavefront path-tracing integrator.

The reference integrates each pixel with nested sequential loops — samples
over bounces over primitives (``/root/reference/include/render.hpp:25-106``).
Here the whole ray batch advances through the bounce loop together
(wavefront): every iteration intersects the batch against the scene and
scatters the surviving lanes, with per-lane alive masks instead of control
flow.  Termination contributions:

* miss  -> radiance += throughput * sky gradient (render.hpp:83-87)
* hit non-scattering material -> radiance += emitted, which in the reference
  is **not** multiplied by the accumulated attenuation (render.hpp:73 — a
  physics quirk).  ``attenuate_emission=True`` gives the physically correct
  alternative; the default False matches the reference.
* depth exhaustion -> contributes black (render.hpp:91)

Two loop flavors: a ``lax.scan`` with per-bounce rematerialization
(reverse-differentiable — used for gradient-based inverse rendering) and a
``lax.while_loop`` with whole-batch early exit (forward-only, faster once
most lanes die).

Two execution modes:

* **parity**: per-pixel xorshift streams seeded with the pixel linear id and
  samples iterated sequentially (render.hpp:126-136 semantics) — used by the
  golden tests against the NumPy oracle.
* **perf**: (pixel, sample) lanes with independent counter-seeded streams so
  the sample axis parallelizes and chunks stream through the device.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..core.vec import Vec3, lerp, unit_vector, where as vwhere
from ..scene import types as T
from .intersect import intersect_scene
from .scatter import scatter

SKY_TOP = (0.5, 0.7, 1.0)


class PathState(NamedTuple):
    o: Vec3
    d: Vec3
    time: jnp.ndarray
    rng: jnp.ndarray
    throughput: Vec3
    radiance: Vec3
    alive: jnp.ndarray


def _bounce(scene: T.Scene, state: PathState, attenuate_emission: bool,
            t_min: float, exact: bool = True) -> PathState:
    o, d, time, rng, tp, rad, alive = state
    rng, hit = intersect_scene(scene, o, d, time, rng, alive, t_min, exact)

    # miss -> sky gradient * attenuation (render.hpp:83-87)
    miss = alive & ~hit.hit
    ud = unit_vector(d)
    sky_t = 0.5 * (ud.y + 1.0)
    white = Vec3.full(sky_t.shape, 1.0, 1.0, 1.0)
    top = Vec3.full(sky_t.shape, *SKY_TOP)
    sky = white * (1.0 - sky_t) + top * sky_t
    zero3 = Vec3.zeros(sky_t.shape)
    rad = rad + vwhere(miss, tp * sky, zero3)

    # hit -> scatter
    sc_mask = alive & hit.hit
    rng, sc = scatter(scene, hit, d, rng, sc_mask)

    # non-scattering hit -> emitted (unattenuated in reference mode)
    stop_emit = sc_mask & ~sc.did_scatter
    emit = tp * sc.emitted if attenuate_emission else sc.emitted
    rad = rad + vwhere(stop_emit, emit, zero3)

    cont = sc_mask & sc.did_scatter
    tp = vwhere(cont, tp * sc.attenuation, tp)
    o = vwhere(cont, hit.p, o)
    d = vwhere(cont, sc.direction, d)
    return PathState(o, d, time, rng, tp, rad, cont)


def trace(scene: T.Scene, o: Vec3, d: Vec3, time: jnp.ndarray,
          rng_state: jnp.ndarray, max_depth: int,
          attenuate_emission: bool = False, t_min: float = 1e-3,
          differentiable: bool = False, exact: bool = True
          ) -> Tuple[jnp.ndarray, Vec3]:
    """Trace a batch of camera rays to completion.  Returns (rng', radiance).
    Equivalent to get_color (render.hpp:29-92) over the whole batch."""
    # Derive the carry init from the inputs (o.x * 0) rather than fresh
    # constants: under shard_map the loop outputs are mesh-varying, and a
    # constant init would make the while/scan carry types mismatch
    # ("varying manual axes do not match").
    zero = o.x * 0.0
    one = zero + 1.0
    init = PathState(
        o=o, d=d, time=time, rng=rng_state,
        throughput=Vec3(one, one, one),
        radiance=Vec3(zero, zero, zero),
        alive=one > 0.0,
    )
    if differentiable:
        # scan + per-bounce remat: O(1) residual memory growth per bounce.
        body = jax.checkpoint(
            lambda st, _: (_bounce(scene, st, attenuate_emission, t_min,
                                   exact), None))
        final, _ = jax.lax.scan(body, init, None, length=max_depth)
    else:
        def cond(carry):
            i, st = carry
            return (i < max_depth) & jnp.any(st.alive)

        def body(carry):
            i, st = carry
            return i + 1, _bounce(scene, st, attenuate_emission, t_min,
                                  exact)

        _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return final.rng, final.radiance


# ---------------------------------------------------------------------------
# Camera ray generation
# ---------------------------------------------------------------------------

def camera_rays(cam: Camera, width: int, height: int,
                pix_ids: jnp.ndarray, rng_state: jnp.ndarray
                ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
    """Jittered primary rays for flat pixel ids (linear = y*W + x, y bottom-up
    like the reference fb).  5 draws/lane: u, v jitter then get_ray's
    disk(2) + time(1) — render.hpp:96-99."""
    x = (pix_ids % width).astype(jnp.float32)
    y = (pix_ids // width).astype(jnp.float32)
    rng_state, ju = rng_mod.next_f01(rng_state)
    rng_state, jv = rng_mod.next_f01(rng_state)
    u = (x + ju) / jnp.float32(width)
    v = (y + jv) / jnp.float32(height)
    rng_state, o, d, t = cam.get_ray(u, v, rng_state)
    return rng_state, o, d, t


# ---------------------------------------------------------------------------
# Parity-mode renderer (sequential samples, reference RNG streams)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 9))
def _render_parity_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                       spp: int, max_depth: int, attenuate_emission: bool,
                       t_min: float, pix_start: jnp.ndarray = 0,
                       n_band: int = 0) -> jnp.ndarray:
    n = n_band if n_band else width * height
    pix_ids = (jnp.asarray(pix_start, jnp.uint32)
               + jnp.arange(n, dtype=jnp.uint32))
    state0 = rng_mod.seed_parity(pix_ids)

    def sample_step(carry, _):
        rng, acc = carry
        rng, o, d, t = camera_rays(cam, width, height, pix_ids, rng)
        rng, rad = trace(scene, o, d, t, rng, max_depth, attenuate_emission,
                         t_min, differentiable=False)
        return (rng, acc + rad), None

    (rng, acc), _ = jax.lax.scan(
        sample_step, (state0, Vec3.zeros((n,))), None, length=spp)
    mean = acc / jnp.float32(spp)
    img = jnp.stack([mean.x, mean.y, mean.z], axis=-1)
    return img.reshape(-1, width, 3)


def render_parity(scene: T.Scene, cam: Camera, width: int, height: int,
                  spp: int, max_depth: int = 50,
                  attenuate_emission: bool = False,
                  t_min: float = 1e-3, band_rows: int = 0) -> jnp.ndarray:
    """Render with the reference's exact RNG streams (fb row 0 = image
    bottom, like the reference's y-up framebuffer).

    `band_rows` > 0 renders in horizontal bands of that many pixel rows
    (a host loop reusing one jit): the parity engine's jnp fold keeps
    (lanes, primitives) intermediates live, ~1.5 GB per 100K lanes on the
    final scene — a full 800x480 frame in one batch OOM-crashes a v5e
    worker.  Streams are per-pixel, so banding is bit-exact."""
    if band_rows <= 0:
        return _render_parity_jit(scene, cam, width, height, spp,
                                  max_depth, attenuate_emission, t_min)
    import numpy as np
    bands = []
    for r0 in range(0, height, band_rows):
        nb = min(band_rows, height - r0) * width
        bands.append(np.asarray(_render_parity_jit(
            scene, cam, width, height, spp, max_depth,
            attenuate_emission, t_min, jnp.uint32(r0 * width), nb)))
    return jnp.asarray(np.concatenate(bands, axis=0))


# ---------------------------------------------------------------------------
# Perf-mode renderer (sample-parallel lanes, chunked)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 10))
def _render_chunk_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                      spp_chunk: int, max_depth: int,
                      attenuate_emission: bool, t_min: float,
                      differentiable: bool,
                      pix_start: jnp.ndarray, n_pix: int,
                      samp_start: jnp.ndarray, seed: jnp.ndarray
                      ) -> Vec3:
    """Sum of radiance over ``spp_chunk`` samples for ``n_pix`` consecutive
    pixels starting at ``pix_start``.  Lanes = n_pix * spp_chunk."""
    pix = pix_start + jnp.arange(n_pix, dtype=jnp.uint32)
    pix_ids = jnp.tile(pix, spp_chunk)
    samp_ids = (samp_start
                + jnp.repeat(jnp.arange(spp_chunk, dtype=jnp.uint32), n_pix))
    # seed goes INSIDE the hash: xoring it into the state afterwards only
    # perturbs low bits, which the f32 draw conversion (top 24 bits) cannot
    # see for ~20 xorshift steps — seeds were near-no-ops.
    state = rng_mod.seed_perf(pix_ids, samp_ids, seed)

    state, o, d, t = camera_rays(cam, width, height, pix_ids, state)
    _, rad = trace(scene, o, d, t, state, max_depth, attenuate_emission,
                   t_min, differentiable=differentiable)
    acc = Vec3(
        jnp.sum(rad.x.reshape(spp_chunk, n_pix), axis=0),
        jnp.sum(rad.y.reshape(spp_chunk, n_pix), axis=0),
        jnp.sum(rad.z.reshape(spp_chunk, n_pix), axis=0),
    )
    return acc


@functools.partial(jax.jit,
                   static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _render_fused_jit(scene: T.Scene, cam: Camera, width: int, height: int,
                      spp: int, tile_pix: int, spp_chunk: int,
                      max_depth: int, attenuate_emission: bool,
                      t_min: float, seed: jnp.ndarray) -> jnp.ndarray:
    """Whole-frame render in ONE device dispatch: an in-graph grid loop over
    (pixel tile, sample chunk) wavefronts.  This matters on remote-attached
    TPUs where per-dispatch latency dwarfs compute, and it lets XLA keep the
    scene resident and pipeline chunk iterations.

    Output: (3, W*H) radiance means."""
    n_pix = width * height
    n_tiles = -(-n_pix // tile_pix)
    n_pix_pad = n_tiles * tile_pix
    n_s = -(-spp // spp_chunk)

    fb = jnp.zeros((3, n_pix_pad), jnp.float32)

    def step(k, fb):
        t_idx = k // n_s
        s_idx = k % n_s
        p0 = t_idx * tile_pix
        s0 = (s_idx * spp_chunk).astype(jnp.uint32)
        pix = (p0.astype(jnp.uint32)
               + jnp.arange(tile_pix, dtype=jnp.uint32))
        lanes_pix = jnp.tile(pix, spp_chunk)
        samp = s0 + jnp.repeat(jnp.arange(spp_chunk, dtype=jnp.uint32),
                               tile_pix)
        state = rng_mod.seed_perf(lanes_pix, samp, seed)
        state, o, d, t = camera_rays(cam, width, height, lanes_pix, state)
        _, rad = trace(scene, o, d, t, state, max_depth,
                       attenuate_emission, t_min)
        # zero out samples beyond spp (when spp % spp_chunk != 0); padded
        # pixels land beyond n_pix and are sliced off at the end.
        w = (samp < spp).astype(jnp.float32)
        part = jnp.stack([
            jnp.sum((rad.x * w).reshape(spp_chunk, tile_pix), axis=0),
            jnp.sum((rad.y * w).reshape(spp_chunk, tile_pix), axis=0),
            jnp.sum((rad.z * w).reshape(spp_chunk, tile_pix), axis=0),
        ])
        cur = jax.lax.dynamic_slice(fb, (0, p0), (3, tile_pix))
        return jax.lax.dynamic_update_slice(fb, cur + part, (0, p0))

    fb = jax.lax.fori_loop(0, n_tiles * n_s, step, fb)
    return fb[:, :n_pix] / jnp.float32(spp)


class _WaveState(NamedTuple):
    path: PathState
    pix: jnp.ndarray       # uint32 pixel id per lane (fixed)
    s: jnp.ndarray         # uint32 current sample index per lane
    bounces: jnp.ndarray   # int32 bounce count of the current path
    acc: Vec3              # per-lane accumulated pixel radiance
    segments: jnp.ndarray  # int64-ish f32 counter of traced segments
    iters: jnp.ndarray     # f32 count of while_loop iterations (occupancy
                           # diagnostic: segments / (iters * n_lanes))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _render_wavefront_jit(scene: T.Scene, cam: Camera, width: int,
                          height: int, spp: int, tile_pix: int, slots: int,
                          max_depth: int, attenuate_emission: bool,
                          t_min: float, seed: jnp.ndarray):
    """Single-dispatch wavefront renderer WITH path regeneration.

    Lanes are pinned to pixels (tile_pix pixels x ``slots`` lanes each); a
    lane whose path terminates immediately starts its pixel's next sample
    (sample indices j, j+slots, ...).  Dead time per lane is only the tail
    of its last path instead of (depth - path_len) masked bounces — the
    wavefront equivalent of the reference's per-pixel sample loop
    (render.hpp:95-101) with near-full SIMD occupancy.

    Each (pixel, sample) gets its own counter-seeded stream, so
    regeneration order doesn't change results vs the chunked renderers.

    Returns ((3, n_pix) radiance means, traced segment count)."""
    n_pix = width * height
    n_tiles = -(-n_pix // tile_pix)
    n_lanes = tile_pix * slots

    pix_local = jnp.tile(jnp.arange(tile_pix, dtype=jnp.uint32), slots)
    slot_id = jnp.repeat(jnp.arange(slots, dtype=jnp.uint32), tile_pix)

    def lane_seed(pix, s):
        # seed inside the hash (see _render_chunk_jit note)
        return rng_mod.seed_perf(pix, s, seed)

    def start_paths(pix, s, mask, st: PathState) -> PathState:
        """(Re)start camera paths on masked lanes (others untouched)."""
        state = lane_seed(pix, s)
        state, o, d, t = camera_rays(cam, width, height, pix, state)
        zero = o.x * 0.0
        one = zero + 1.0
        sel = lambda a, b: jnp.where(mask, a, b)
        vsel = lambda a, b: vwhere(mask, a, b)
        return PathState(
            o=vsel(o, st.o), d=vsel(d, st.d), time=sel(t, st.time),
            rng=sel(state, st.rng),
            throughput=vsel(Vec3(one, one, one), st.throughput),
            radiance=vsel(Vec3(zero, zero, zero), st.radiance),
            alive=sel(mask, st.alive),
        )

    def render_tile(tile_idx):
        pix = (tile_idx.astype(jnp.uint32) * tile_pix + pix_local)
        s0 = slot_id
        dummy = PathState(
            o=Vec3.zeros((n_lanes,)), d=Vec3.zeros((n_lanes,)),
            time=jnp.zeros(n_lanes), rng=jnp.zeros(n_lanes, jnp.uint32),
            throughput=Vec3.zeros((n_lanes,)),
            radiance=Vec3.zeros((n_lanes,)),
            alive=jnp.zeros(n_lanes, bool))
        path0 = start_paths(pix, s0, s0 < spp, dummy)
        ws0 = _WaveState(
            path=path0, pix=pix, s=s0,
            bounces=jnp.zeros(n_lanes, jnp.int32),
            acc=Vec3.zeros((n_lanes,)),
            segments=jnp.zeros((), jnp.float32),
            iters=jnp.zeros((), jnp.float32),
        )

        def cond(ws: _WaveState):
            return jnp.any(ws.path.alive)

        def body(ws: _WaveState):
            segs = ws.segments + jnp.sum(
                ws.path.alive.astype(jnp.float32))
            was_alive = ws.path.alive
            st = _bounce(scene, ws.path, attenuate_emission, t_min,
                         exact=False)
            bounces = ws.bounces + 1
            # depth exhaustion terminates with black (render.hpp:91)
            exhausted = st.alive & (bounces >= max_depth)
            st = st._replace(alive=st.alive & ~exhausted)
            finished = was_alive & ~st.alive
            zero3 = Vec3.zeros((n_lanes,))
            acc = ws.acc + vwhere(finished, st.radiance, zero3)
            # regenerate: next sample of the same pixel, if any left
            s_next = ws.s + jnp.uint32(slots)
            regen = finished & (s_next < spp)
            s = jnp.where(finished, s_next, ws.s)
            st = start_paths(ws.pix, s, regen, st)
            bounces = jnp.where(regen, 0, bounces)
            return _WaveState(path=st, pix=ws.pix, s=s, bounces=bounces,
                              acc=acc, segments=segs, iters=ws.iters + 1.0)

        ws = jax.lax.while_loop(cond, body, ws0)
        acc = ws.acc
        part = jnp.stack([
            jnp.sum(acc.x.reshape(slots, tile_pix), axis=0),
            jnp.sum(acc.y.reshape(slots, tile_pix), axis=0),
            jnp.sum(acc.z.reshape(slots, tile_pix), axis=0),
        ])
        return part, ws.segments, ws.iters

    def step(t_idx, carry):
        fb, segs, iters = carry
        part, s, it = render_tile(t_idx)
        fb = jax.lax.dynamic_update_slice(
            fb, jax.lax.dynamic_slice(
                fb, (0, t_idx * tile_pix), (3, tile_pix)) + part,
            (0, t_idx * tile_pix))
        return fb, segs + s, iters + it

    fb0 = jnp.zeros((3, n_tiles * tile_pix), jnp.float32)
    fb, segments, iters = jax.lax.fori_loop(
        0, n_tiles, step,
        (fb0, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))
    return fb[:, :n_pix] / jnp.float32(spp), segments, iters


def render_wavefront(scene: T.Scene, cam: Camera, width: int, height: int,
                     spp: int, max_depth: int = 50,
                     attenuate_emission: bool = False, t_min: float = 1e-3,
                     seed: int = 0, tile_pix: Optional[int] = None,
                     slots: Optional[int] = None,
                     return_segments: bool = False,
                     return_stats: bool = False):
    """Regenerating single-dispatch renderer — the perf default.  Output
    (H, W, 3) (+ traced segment count if requested; return_stats adds the
    loop-iteration count for occupancy diagnostics).

    Pure-jnp engine: the oracle the production wq megakernel is anchored
    against (tests/test_wq.py).  Small tiles bound the (N, P)
    intersection intermediates.  (The retired prim_fold in-loop pallas
    branch was deleted in r4 — perf lives in engine.wq.)"""
    n_pix = width * height
    on_tpu = jax.default_backend() not in ("cpu",)
    if tile_pix is None:
        if on_tpu:
            # whole frame (rounded up to the pallas lane quantum; padded
            # lanes trace off-frame pixels and are sliced away)
            tile_pix = min(-(-n_pix // 256) * 256, 1 << 19)
        else:
            tile_pix = 16384
    if slots is None:
        slots = 1 if on_tpu else 4
    tile_pix = min(tile_pix, -(-n_pix // 256) * 256)
    slots = max(1, min(slots, spp))
    fb, segments, iters = _render_wavefront_jit(
        scene, cam, width, height, spp, tile_pix, slots, max_depth,
        attenuate_emission, t_min, jnp.uint32(seed))
    img = jnp.stack([fb[0], fb[1], fb[2]], axis=-1).reshape(height, width, 3)
    if return_stats:
        return img, {"segments": segments, "iters": iters,
                     "lanes": tile_pix * slots,
                     "tiles": -(-n_pix // tile_pix)}
    if return_segments:
        return img, segments
    return img


def render_fused(scene: T.Scene, cam: Camera, width: int, height: int,
                 spp: int, max_depth: int = 50,
                 attenuate_emission: bool = False, t_min: float = 1e-3,
                 seed: int = 0, tile_pix: int = 16384,
                 spp_chunk: int = 4) -> jnp.ndarray:
    """Single-dispatch perf renderer.  Output (H, W, 3), fb row 0 = image
    bottom."""
    tile_pix = min(tile_pix, width * height)
    spp_chunk = min(spp_chunk, spp)
    fb = _render_fused_jit(scene, cam, width, height, spp, tile_pix,
                           spp_chunk, max_depth, attenuate_emission, t_min,
                           jnp.uint32(seed))
    img = jnp.stack([fb[0], fb[1], fb[2]], axis=-1)
    return img.reshape(height, width, 3)


def render_perf(scene: T.Scene, cam: Camera, width: int, height: int,
                spp: int, max_depth: int = 50,
                attenuate_emission: bool = False, t_min: float = 1e-3,
                seed: int = 0, max_lanes: int = 1 << 17,
                differentiable: bool = False) -> jnp.ndarray:
    """Chunked sample-parallel render.  Output (H, W, 3), fb row 0 = image
    bottom (flip happens at save, like main.cpp:41)."""
    n = width * height
    # choose pixel-tile size and spp chunking under the lane budget
    spp_chunk = max(1, min(spp, max_lanes // min(n, max_lanes)))
    tile_pix = max(1, min(n, max_lanes // spp_chunk))
    seed_arr = jnp.uint32(seed)

    tiles = []
    for p0 in range(0, n, tile_pix):
        npx = min(tile_pix, n - p0)
        acc = None
        for s0 in range(0, spp, spp_chunk):
            sc = min(spp_chunk, spp - s0)
            part = _render_chunk_jit(
                scene, cam, width, height, sc, max_depth,
                attenuate_emission, t_min, differentiable,
                jnp.uint32(p0), npx, jnp.uint32(s0), seed_arr)
            acc = part if acc is None else Vec3(acc.x + part.x,
                                                acc.y + part.y,
                                                acc.z + part.z)
        tiles.append(acc)
    full = Vec3(
        jnp.concatenate([t_.x for t_ in tiles]),
        jnp.concatenate([t_.y for t_ in tiles]),
        jnp.concatenate([t_.z for t_ in tiles]),
    )
    mean = full / jnp.float32(spp)
    img = jnp.stack([mean.x, mean.y, mean.z], axis=-1)
    return img.reshape(height, width, 3)
