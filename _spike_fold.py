"""Spike: scalar-loop dense sphere fold vs lane-table fold.

Workload: 480256 rays x 512 spheres (final-scene scale).
"""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

P = 512          # spheres (padded)
N = 480256 // 2 * 2

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
ox = jax.random.normal(ks[0], (N,)) * 5
oy = jax.random.normal(ks[1], (N,)) * 5
oz = jax.random.normal(ks[2], (N,)) * 5
dx = jax.random.normal(ks[3], (N,))
dy = jax.random.normal(ks[4], (N,))
dz = jax.random.normal(ks[5], (N,))
cx = np.random.RandomState(0).uniform(-11, 11, P).astype(np.float32)
cy = np.full(P, 0.2, np.float32)
cz = np.random.RandomState(1).uniform(-11, 11, P).astype(np.float32)
r2 = np.full(P, 0.04, np.float32)

# params packed as SMEM scalars: rows = cx, cy, cz, r2
tab = jnp.asarray(np.stack([cx, cy, cz, r2, cx * cx + cy * cy + cz * cz - r2]), jnp.float32)  # (5, P)

SUB = 8  # sublanes per tile


def kernel_dense(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_ref, idx_ref, *, n_p, tile):
    o_x, o_y, o_z = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    d_x, d_y, d_z = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    a = d_x * d_x + d_y * d_y + d_z * d_z
    o_o = o_x * o_x + o_y * o_y + o_z * o_z
    o_d = o_x * d_x + o_y * d_y + o_z * d_z
    inf = jnp.float32(jnp.inf)
    tmin_a = jnp.float32(1e-3) * a

    def body(i, carry):
        best, bidx = carry
        ccx = tab_ref[0, i]
        ccy = tab_ref[1, i]
        ccz = tab_ref[2, i]
        kk = tab_ref[4, i]          # |c|^2 - r^2
        c_d = ccx * d_x + ccy * d_y + ccz * d_z
        c_o = ccx * o_x + ccy * o_y + ccz * o_z
        b = o_d - c_d
        cc = o_o - 2.0 * c_o + kk
        disc = b * b - a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        key1 = -b - sq
        key2 = -b + sq
        ok1 = has & (key1 > tmin_a) & (key1 < best)
        ok2 = has & (key2 > tmin_a) & (key2 < best)
        keyv = jnp.where(ok1, key1, jnp.where(ok2, key2, inf))
        upd = keyv < best
        best = jnp.where(upd, keyv, best)
        bidx = jnp.where(upd, jnp.float32(i) + jnp.zeros_like(best), bidx)
        return best, bidx

    init = (jnp.full(tile, inf, jnp.float32), jnp.zeros(tile, jnp.float32))
    best, bidx = jax.lax.fori_loop(0, n_p, body, init)
    t_ref[:, :] = best / a
    idx_ref[:, :] = bidx


def run_dense(tile_rays, unroll=False):
    tile = (tile_rays // 128, 128)
    g = N // tile_rays
    resh = lambda x: x.reshape(N // 128, 128)
    spec = pl.BlockSpec(tile, lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(kernel_dense, n_p=P, tile=tile)
    f = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 6,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N // 128, 128), jnp.float32)] * 2,
    )
    return jax.jit(lambda: f(tab, resh(ox), resh(oy), resh(oz), resh(dx), resh(dy), resh(dz)))


for tile_rays in (1024, 4096, 16384):
    try:
        f = run_dense(tile_rays)
        r = f(); jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"dense scalar-loop tile={tile_rays}: {dt*1e3:.2f} ms -> {N/dt/1e6:.1f} Mray/s  ops/s={(N*P*22)/dt/1e12:.2f}T")
    except Exception as e:
        print(f"dense tile={tile_rays} FAIL: {str(e).splitlines()[0][:120]}")

# variant: params as VMEM (5,P) with vector slice + broadcast of scalar? try tab in SMEM
# Also unrolled python loop over 512 (compile time!) -- try 128 only to gauge
def kernel_unroll(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  t_ref, idx_ref, *, n_p, tile):
    o_x, o_y, o_z = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    d_x, d_y, d_z = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    a = d_x * d_x + d_y * d_y + d_z * d_z
    o_o = o_x * o_x + o_y * o_y + o_z * o_z
    o_d = o_x * d_x + o_y * d_y + o_z * d_z
    inf = jnp.float32(jnp.inf)
    tmin_a = jnp.float32(1e-3) * a
    best = jnp.full(tile, inf, jnp.float32)
    bidx = jnp.zeros(tile, jnp.float32)
    UN = 4
    def body(j, carry):
        best, bidx = carry
        for u in range(UN):
            i = j * UN + u
            ccx = tab_ref[0, i]; ccy = tab_ref[1, i]; ccz = tab_ref[2, i]
            kk = tab_ref[4, i]
            c_d = ccx * d_x + ccy * d_y + ccz * d_z
            c_o = ccx * o_x + ccy * o_y + ccz * o_z
            b = o_d - c_d
            cc = o_o - 2.0 * c_o + kk
            disc = b * b - a * cc
            has = disc > 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            key1 = -b - sq
            key2 = -b + sq
            ok1 = has & (key1 > tmin_a) & (key1 < best)
            ok2 = has & (key2 > tmin_a) & (key2 < best)
            keyv = jnp.where(ok1, key1, jnp.where(ok2, key2, inf))
            upd = keyv < best
            best = jnp.where(upd, keyv, best)
            bidx = jnp.where(upd, jnp.float32(i) + jnp.zeros_like(best), bidx)
        return best, bidx
    best, bidx = jax.lax.fori_loop(0, n_p // UN, body, (best, bidx))
    t_ref[:, :] = best / a
    idx_ref[:, :] = bidx


def run_unroll(tile_rays):
    tile = (tile_rays // 128, 128)
    g = N // tile_rays
    resh = lambda x: x.reshape(N // 128, 128)
    spec = pl.BlockSpec(tile, lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(kernel_unroll, n_p=P, tile=tile)
    f = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 6,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N // 128, 128), jnp.float32)] * 2,
    )
    return jax.jit(lambda: f(tab, resh(ox), resh(oy), resh(oz), resh(dx), resh(dy), resh(dz)))

for tile_rays in (4096,):
    try:
        f = run_unroll(tile_rays)
        r = f(); jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"unroll4 tile={tile_rays}: {dt*1e3:.2f} ms -> {N/dt/1e6:.1f} Mray/s")
    except Exception as e:
        print(f"unroll tile={tile_rays} FAIL: {str(e).splitlines()[0][:120]}")
