"""Spike: per-row (P,128) matrix sphere-intersect cost on TPU.

Validates the planned mxu_bounce design: for each state row (128 rays on
lanes), test all P spheres (sublanes) with broadcast elementwise ops, then
min-reduce + one-hot attr gather via MXU.  Measures cycles/ray.
"""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 512          # spheres (padded)
A = 14           # attr columns
LANE = 128
TILE_ROWS = 64
INF = float("inf")


def kernel(tab, attrs, ox, oy, oz, dx, dy, dz, tm, o_t, o_meta, *, rows):
    def row(r, _):
        rs = pl.ds(r, 1)
        oxv = ox[rs, :]; oyv = oy[rs, :]; ozv = oz[rs, :]
        dxv = dx[rs, :]; dyv = dy[rs, :]; dzv = dz[rs, :]
        tmv = tm[rs, :]
        a = dxv * dxv + dyv * dyv + dzv * dzv
        tmin_a = jnp.float32(1e-3) * a

        c0x = tab[:, 0:1]; c0y = tab[:, 1:2]; c0z = tab[:, 2:3]
        dcx = tab[:, 3:4]; dcy = tab[:, 4:5]; dcz = tab[:, 5:6]
        t0 = tab[:, 6:7]; idt = tab[:, 7:8]; r2 = tab[:, 8:9]

        kmov = (tmv - t0) * idt                     # (P,128)
        cx = c0x + kmov * dcx
        cy = c0y + kmov * dcy
        cz = c0z + kmov * dcz
        ocx = oxv - cx; ocy = oyv - cy; ocz = ozv - cz
        b = ocx * dxv + ocy * dyv + ocz * dzv
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        negb = -b
        k1 = negb - sq
        k2 = negb + sq
        ok1 = has & (k1 > tmin_a)
        ok2 = has & (k2 > tmin_a)
        key = jnp.where(ok1, k1, jnp.where(ok2, k2, INF))

        m = jnp.min(key, axis=0, keepdims=True)          # (1,128)
        pio = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(
            jnp.float32)
        idx = jnp.min(jnp.where(key == m, pio, jnp.float32(P)), axis=0,
                      keepdims=True)
        onehot = jnp.where((key == m) & (pio == idx) & (m < INF), 1.0, 0.0)
        # attr gather via MXU: (A,P) @ (P,128)
        win = jax.lax.dot_general(
            attrs[:, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # (A,128)
        o_t[rs, :] = m
        o_meta[rs, :] = win[10:11, :]
        return 0

    jax.lax.fori_loop(0, rows, row, 0, unroll=False)


def run(rows_total, trials=3):
    grid = rows_total // TILE_ROWS
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    sh = (rows_total, LANE)
    ox, oy, oz, dx, dy, dz, tm = [
        jax.random.normal(k, sh, jnp.float32) * 5.0 for k in ks[:7]]
    tab = jax.random.normal(ks[7], (P, 9), jnp.float32)
    tab = tab.at[:, 8].set(jnp.abs(tab[:, 8]) + 0.1)
    attrs = jnp.arange(A * P, dtype=jnp.float32).reshape(A, P) % 997.0

    vspec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, rows=TILE_ROWS),
        grid=(grid,),
        in_specs=[full, full] + [vspec] * 7,
        out_specs=[vspec] * 2,
        out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32)] * 2,
    )
    fj = jax.jit(lambda *a: f(*a))
    t, meta = fj(tab, attrs, ox, oy, oz, dx, dy, dz, tm)
    jax.block_until_ready(t)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        t, meta = fj(tab, attrs, ox, oy, oz, dx, dy, dz, tm)
        jax.block_until_ready(t)
        best = min(best, time.perf_counter() - t0)
    rays = rows_total * LANE
    print(f"rows={rows_total} grid={grid}: {best*1e3:.3f} ms"
          f" -> {rays/best/1e6:.1f} Mray/s"
          f"  ({best*0.94e9/rays:.1f} cyc/ray @0.94GHz)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    t0 = time.perf_counter()
    run(TILE_ROWS)       # compile probe
    print(f"(first run incl nothing; compile took {time.perf_counter()-t0:.1f}s total)",
          flush=True)
    run(TILE_ROWS * 16)
    run(TILE_ROWS * 64)
