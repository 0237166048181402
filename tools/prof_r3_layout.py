"""Why do the SAME sole-op gather/scatter programs run 0.02-0.05 ms with
synthetic index arrays but 5.8-10.6 ms when the indices are another jit's
output (prof_r3_split.py)?  Suspect: device LAYOUT of the index/value
operands (tiled (8,128) vs linear) specializing the compiled program off
the DMA path.  Matrix: index provenance x chaining."""
import time

import jax
import jax.numpy as jnp

ROWS, LANE = 3776, 128
L = ROWS * LANE
N_PIX = 480000
N_ATLAS = 1239809


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
tab = jax.random.randint(k3, (N_ATLAS,), 0, 2 ** 30).astype(jnp.uint32)
fb0 = jnp.zeros((N_PIX + 1,), jnp.float32)

idx_fresh1d = jax.random.randint(k1, (L,), 0, N_PIX, jnp.int32)
idx_fresh2d = jax.random.randint(k1, (ROWS, LANE), 0, N_PIX, jnp.int32)
vals_fresh = jax.random.normal(k2, (L,))

# indices produced by a jit that reshapes a 2D tiled array to 1D
@jax.jit
def make_flat(a2d):
    return (a2d + 0).reshape(-1), (a2d.astype(jnp.float32) * 1e-9).reshape(-1)

idx_jit, vals_jit = make_flat(idx_fresh2d)
jax.block_until_ready(idx_jit)

# same values round-tripped through device_put (forces default layout)
idx_dput = jax.device_put(np.asarray(idx_jit)) if False else None
import numpy as np  # noqa: E402
idx_roundtrip = jax.device_put(np.asarray(idx_jit))
vals_roundtrip = jax.device_put(np.asarray(vals_jit))

print("formats:", flush=True)
try:
    print("  fresh1d", idx_fresh1d.format)
    print("  jit-out", idx_jit.format)
    print("  roundtrip", idx_roundtrip.format)
except Exception as e:
    print("  (no .format attr)", e)

take = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
print(f"take fresh 1D idx:        {timeit(take, tab, idx_fresh1d):7.3f} ms",
      flush=True)
print(f"take fresh 2D idx:        {timeit(take, tab, idx_fresh2d):7.3f} ms",
      flush=True)
print(f"take jit-output idx:      {timeit(take, tab, idx_jit):7.3f} ms",
      flush=True)
print(f"take roundtripped idx:    {timeit(take, tab, idx_roundtrip):7.3f} ms",
      flush=True)

scat = jax.jit(lambda fb, i, v: fb.at[i].add(v))
print(f"scatter fresh unchained:  {timeit(scat, fb0, idx_fresh1d, vals_fresh):7.3f} ms",
      flush=True)
print(f"scatter jit-out unchained:{timeit(scat, fb0, idx_jit, vals_jit):7.3f} ms",
      flush=True)
print(f"scatter roundtrip unchd:  {timeit(scat, fb0, idx_roundtrip, vals_roundtrip):7.3f} ms",
      flush=True)


def chained(fb, i, v, n=10):
    for _ in range(n):
        fb = scat(fb, i, v)
    jax.block_until_ready(fb)
    return fb


fb = chained(fb0, idx_fresh1d, vals_fresh, 2)
t0 = time.perf_counter()
fb = chained(fb, idx_fresh1d, vals_fresh, 10)
print(f"scatter fresh CHAINED:    {(time.perf_counter()-t0)/10*1e3:7.3f} ms",
      flush=True)
fb = chained(fb0, idx_jit, vals_jit, 2)
t0 = time.perf_counter()
fb = chained(fb, idx_jit, vals_jit, 10)
print(f"scatter jit-out CHAINED:  {(time.perf_counter()-t0)/10*1e3:7.3f} ms",
      flush=True)

# does a tiny "layout-normalizing" jit restore the fast path?
relayout = jax.jit(lambda x: jnp.where(x < 0, 0, x))
idx_relay = relayout(idx_jit)
jax.block_until_ready(idx_relay)
print(f"take relayout-jit idx:    {timeit(take, tab, idx_relay):7.3f} ms",
      flush=True)
