"""Does an SMEM-scalar broadcast cost a VPU slot? Replica of sph_static
fold with (a) SMEM per-iteration scalars, (b) compile-time constants."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE, GRID = 64, 128, 59
N_SPH = 489
INF = float("inf")

def make(use_smem, unroll, n_it=N_SPH):
    def kern(sph, ox, oy, oz, dx, dy, dz, out):
        oxv, oyv, ozv = ox[:, :], oy[:, :], oz[:, :]
        dxv, dyv, dzv = dx[:, :], dy[:, :], dz[:, :]
        a = dxv*dxv + dyv*dyv + dzv*dzv
        tmin_a = 1e-3 * a
        zero = jnp.zeros_like(a)
        bk = jnp.full_like(a, INF)
        c = (bk, zero, zero, zero, zero, zero, zero, zero, zero, zero)
        def body(i, c):
            (bk, bcx, bcy, bcz, brinv, bmeta, bpar, bar, bag, bab) = c
            if use_smem:
                cx = sph[0, i]; cy = sph[1, i]; cz = sph[2, i]
                r2 = sph[8, i]
                a9 = sph[9, i]; a10 = sph[10, i]; a11 = sph[11, i]
                a12 = sph[12, i]; a13 = sph[13, i]; a14 = sph[14, i]
            else:
                fi = 1.0 + 1e-6 * 1  # constants
                cx = 1.5; cy = 0.2; cz = -3.0; r2 = 0.04
                a9 = 5.0; a10 = 33.0; a11 = 0.1
                a12 = .5; a13 = .6; a14 = .7
            ocx = oxv - cx; ocy = oyv - cy; ocz = ozv - cz
            b = ocx*dxv + ocy*dyv + ocz*dzv
            cc = ocx*ocx + ocy*ocy + ocz*ocz - r2
            disc = b*b - a*cc
            has = disc > 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            negb = -b
            k1 = negb - sq; k2 = negb + sq
            ok1 = has & (k1 > tmin_a) & (k1 < bk)
            ok2 = has & (k2 > tmin_a) & (k2 < bk)
            keyv = jnp.where(ok1, k1, jnp.where(ok2, k2, INF))
            upd = keyv < bk
            sel = lambda n_, o_: jnp.where(upd, n_, o_)
            return (sel(keyv, bk), sel(cx+zero, bcx), sel(cy+zero, bcy),
                    sel(cz+zero, bcz), sel(a9+zero, brinv),
                    sel(a10+zero, bmeta), sel(a11+zero, bpar),
                    sel(a12+zero, bar), sel(a13+zero, bag),
                    sel(a14+zero, bab))
        c = jax.lax.fori_loop(0, n_it, body, c, unroll=unroll)
        out[:, :] = c[0] + c[1] + c[4] + c[7]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kern, grid=(GRID,), in_specs=[smem] + [vspec]*6, out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((ROWS*GRID, LANE), jnp.float32)))

sph = jnp.ones((15, 512), jnp.float32) * 1.1
args = [jnp.ones((ROWS*GRID, LANE), jnp.float32) * (0.1 * i + 0.3)
        for i in range(6)]

def t(f):
    r = np.asarray(f(sph, *args)[0, :1])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        r = np.asarray(f(sph, *args)[0, :1])
        best = min(best, time.perf_counter() - t0)
    return best

base = {}
for use_smem in (True, False):
    for unroll in (1, 4, 8):
        lo = t(make(use_smem, unroll, N_SPH))
        hi = t(make(use_smem, unroll, N_SPH*3))
        d = (hi - lo) / (N_SPH*2)
        lanes = ROWS*GRID*LANE
        print(f"smem={use_smem} unroll={unroll}: {d*1e9:6.2f} ns/sphere "
              f"-> fold {d*N_SPH*1e3:5.2f} ms/bounce")
