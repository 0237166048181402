"""Microbench v2: scale the in-kernel trip count and difference the sync
wall times — immune to dispatch-latency and call-dedup artifacts."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE, GRID = 64, 128, 59
LANES = ROWS * GRID * LANE


def run_once(f, *args):
    r = f(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def bench(body, n_ops_per_it, name):
    def make(n_it):
        def kern(a, b, o):
            x = a[:, :]
            y = b[:, :]
            x = jax.lax.fori_loop(0, n_it, lambda i, x: body(i, x, y), x)
            o[:, :] = x
        vspec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        f = pl.pallas_call(kern, grid=(GRID,), in_specs=[vspec]*2,
                           out_specs=vspec,
                           out_shape=jax.ShapeDtypeStruct((ROWS*GRID, LANE),
                                                          jnp.float32))
        return jax.jit(f)
    a = jnp.full((ROWS*GRID, LANE), 1.0000001, jnp.float32)
    b = jnp.full((ROWS*GRID, LANE), 0.9999999, jnp.float32)
    t_lo = run_once(make(489), a, b)
    t_hi = run_once(make(4890), a, b)
    dt = (t_hi - t_lo) / (4890 - 489)   # per iteration
    ops = LANES * n_ops_per_it
    print(f"{name:22s}: {dt*1e6:7.3f} us/it  {ops/dt/1e12:6.2f} T op/s "
          f"(lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms)")


bench(lambda i, x, y: ((((((((x*y+y)*y+y)*y+y)*y+y)*y+y)*y+y)*y+y)*y+y),
      8, "8x fma")
bench(lambda i, x, y: x * y + y, 1, "1x fma")
bench(lambda i, x, y: x / (y + x), 2, "add + div")
bench(lambda i, x, y: jnp.sqrt(x + y * x), 2, "fma + sqrt")
bench(lambda i, x, y: jax.lax.rsqrt(x + y * x), 2, "fma + rsqrt")
bench(lambda i, x, y: jnp.where(x > y, x * y, y), 3, "cmp + sel + mul")
bench(lambda i, x, y: jnp.minimum(x, x * y), 2, "mul + min")

# XLA flat u32 gather
for tabn in (1 << 14, 1 << 17):
    tab = jnp.arange(tabn, dtype=jnp.uint32)
    idx = ((jnp.arange(LANES, dtype=jnp.uint32) * jnp.uint32(2654435761))
           % jnp.uint32(tabn)).astype(jnp.int32).reshape(ROWS*GRID, LANE)
    g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = run_once(g, tab, idx)
    print(f"flat u32 gather tab={tabn:7d}: {dt*1e3:7.3f} ms "
          f"({LANES/dt/1e6:.0f} M idx/s)")

# (N,3) f32 row gather for comparison (the current atlas pattern)
tab3 = jnp.ones((1 << 14, 3), jnp.float32)
idx = ((jnp.arange(LANES, dtype=jnp.uint32) * jnp.uint32(2654435761))
       % jnp.uint32(1 << 14)).astype(jnp.int32).reshape(ROWS*GRID, LANE)
g3 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dt = run_once(g3, tab3, idx)
print(f"(N,3) f32 row gather      : {dt*1e3:7.3f} ms ({LANES/dt/1e6:.0f} M idx/s)")
