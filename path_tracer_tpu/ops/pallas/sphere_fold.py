"""Pallas TPU kernel: fused sphere-class closest-hit fold.

The jnp path materializes ~30 (N, P) float32 temporaries per bounce in HBM
(~1 GB of traffic for 16K rays x 512 spheres); this kernel keeps the whole
fold on-chip and is VPU-throughput bound.

Layout (measured fastest of three working variants on v5e):

* rays ride SUBLANES as (BR, 1) blocks, spheres ride LANES as (1, 128)
  rows of the VMEM-resident table — every VPU instruction covers
  BR x 128 ray-sphere pairs with only P/128 (unrolled, statically sliced)
  column-block iterations, so instruction-issue overhead amortizes ~128x
  better than a scalar-loop-over-spheres formulation (which measured
  4 ms / 65K rays, instruction-bound);
* division-free compare: for a fixed ray the roots order by
  key = -b -/+ sqrt(disc) (t = key / a with a = d.d > 0 constant per ray),
  so the fold tracks keys and divides once at the end — the final t equals
  the reference formula (-b - sq)/a (sphere.hpp:74-99);
* first-minimum tie-breaking (the sphere scan's strict `t < max`,
  sphere.hpp:76) is reproduced by the final cross-lane arg-reduction
  taking the smallest sphere index among key ties;
* per-medium prefix minima (the closest-so-far the reference scan would
  have at each constant_medium's scan position, render.hpp:37-49) fold in
  the same pass, gated by the spheres' scan indices.

Correctness on hardware is validated against a float64 NumPy oracle
(tests/test_pallas.py runs the same kernel in interpret mode): 100% hit
set, 100% winner index, t rel err <= 9e-5 on the full final scene.

Forward-only: the differentiable path uses the jnp kernels (pallas custom
VJP is future work).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.vec import Vec3
from ...scene import types as T

LANE = 128
BR = 256  # rays per program (sublane-major)


def _pack_sphere_table(s: T.Spheres) -> Tuple[jnp.ndarray, int]:
    """(10, P_pad) f32 table, padded to a lane multiple.  Rows:
    c0x c0y c0z dcx dcy dcz r2 time0 inv_denom scan.
    Inactive/padding spheres get r2 = -inf so disc < 0 never has roots."""
    p = s.radius.shape[0]
    p_pad = -(-p // LANE) * LANE
    denom = s.time1 - s.time0
    inv_denom = jnp.where(denom == 0.0, 0.0,
                          1.0 / jnp.where(denom == 0.0, 1.0, denom))
    r2 = jnp.where(s.active, s.radius * s.radius, -jnp.inf)
    cols = [
        s.c0.x, s.c0.y, s.c0.z,
        s.c1.x - s.c0.x, s.c1.y - s.c0.y, s.c1.z - s.c0.z,
        r2, s.time0, inv_denom,
        s.scan.astype(jnp.float32),
    ]
    tab = jnp.stack([jnp.pad(c.astype(jnp.float32), (0, p_pad - p),
                             constant_values=(-jnp.inf if i == 6 else 0.0))
                     for i, c in enumerate(cols)], axis=0)
    return tab, p_pad


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, rt_ref,
            tab_ref, med_scan_ref,
            t_ref, idx_ref, pref_ref, *, n_blocks: int, n_media: int,
            t_min: float):
    ox = ox_ref[:, :]   # (BR, 1)
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]
    rt = rt_ref[:, :]

    a = dx * dx + (dy * dy + dz * dz)          # (BR, 1), > 0
    tmin_a = jnp.float32(t_min) * a

    inf = jnp.float32(jnp.inf)
    best_key = jnp.full((BR, LANE), inf, jnp.float32)
    best_blk = jnp.zeros((BR, LANE), jnp.float32)
    prefs = [jnp.full((BR, LANE), inf, jnp.float32)
             for _ in range(n_media)]

    # unrolled, statically-sliced column blocks
    for blk in range(n_blocks):
        sl = slice(blk * LANE, (blk + 1) * LANE)
        col = lambda c: tab_ref[c:c + 1, sl]    # (1, LANE)
        c0x, c0y, c0z = col(0), col(1), col(2)
        dcx, dcy, dcz = col(3), col(4), col(5)
        r2, tm0, invd = col(6), col(7), col(8)

        k = (rt - tm0) * invd                   # 0 for static spheres
        ocx = ox - (c0x + k * dcx)
        ocy = oy - (c0y + k * dcy)
        ocz = oz - (c0z + k * dcz)
        b = ocx * dx + (ocy * dy + ocz * dz)
        cc = ocx * ocx + (ocy * ocy + ocz * ocz) - r2
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        key1 = -b - sq
        key2 = -b + sq
        ok1 = has & (key1 > tmin_a)             # t1 > t_min, strict
        ok2 = has & (key2 > tmin_a)
        key = jnp.where(ok1, key1, jnp.where(ok2, key2, inf))

        better = key < best_key                 # strict: first-min wins
        best_key = jnp.where(better, key, best_key)
        best_blk = jnp.where(better, jnp.float32(blk), best_blk)

        for m in range(n_media):
            in_prefix = col(9) < med_scan_ref[m]
            prefs[m] = jnp.minimum(prefs[m],
                                   jnp.where(in_prefix, key, inf))

    # cross-lane arg-reduction with smallest-index tie-breaking
    lane_ids = jax.lax.broadcasted_iota(
        jnp.int32, (BR, LANE), 1).astype(jnp.float32)
    key_star = jnp.min(best_key, axis=1, keepdims=True)     # (BR, 1)
    sphere_idx = best_blk * jnp.float32(LANE) + lane_ids
    cand = jnp.where(best_key == key_star, sphere_idx, jnp.float32(2**30))
    idx = jnp.min(cand, axis=1, keepdims=True)               # (BR, 1)

    t_ref[:, :] = jnp.where(key_star < inf, key_star / a, inf)
    idx_ref[:, :] = idx.astype(jnp.int32)
    if n_media:
        pref_cols = [jnp.min(p_, axis=1, keepdims=True) for p_ in prefs]
        pref_ref[:, :] = (jnp.concatenate(pref_cols, axis=1)
                          if len(pref_cols) > 1 else pref_cols[0]) / a
    else:
        pref_ref[:, :] = jnp.full((BR, 1), inf, jnp.float32)


@functools.partial(jax.jit, static_argnums=(3,))
def sphere_fold(spheres: T.Spheres, ro: Vec3, rd: Vec3, t_min: float,
                rtime: jnp.ndarray, med_scans: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest sphere hit for a ray batch.

    Returns (t (N,), idx (N,) int32, prefix_t (M, N)) where prefix_t[m] is
    the minimum sphere-hit t restricted to scan < med_scans[m].  N must be
    a multiple of 256."""
    n = ro.x.shape[0]
    assert n % BR == 0, f"ray count {n} not a multiple of {BR}"
    g = n // BR
    n_media = int(med_scans.shape[0])
    m_out = max(n_media, 1)

    tab, p_pad = _pack_sphere_table(spheres)
    n_blocks = p_pad // LANE

    resh = lambda x: x.reshape(n, 1)
    med_in = med_scans.astype(jnp.float32)
    if n_media == 0:
        med_in = jnp.zeros((1,), jnp.float32)

    ray_spec = pl.BlockSpec((BR, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_blocks=n_blocks,
                               n_media=n_media, t_min=float(t_min))
    t, idx, pref = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # media scans
        ],
        out_specs=[
            pl.BlockSpec((BR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, m_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, m_out), jnp.float32),
        ],
    )(resh(ro.x), resh(ro.y), resh(ro.z), resh(rd.x), resh(rd.y),
      resh(rd.z), resh(rtime), tab, med_in)

    pref_t = jnp.moveaxis(pref, 1, 0)
    return t.reshape(n), idx.reshape(n), pref_t[:n_media]
