"""Which formulation of the atlas texel gather is fast on TPU?"""
import time

import jax
import jax.numpy as jnp

ROWS, LANE = 4704, 128
N_ATLAS = 1_239_809

key = jax.random.PRNGKey(0)
atlas = jax.random.randint(key, (N_ATLAS,), 0, 2**31 - 1).astype(jnp.uint32)
idx2d = jax.random.randint(key, (ROWS, LANE), 0, N_ATLAS)
idx1d = idx2d.reshape(-1)


def bench(fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


variants = {
    "take 2d idx": jax.jit(lambda a, i: jnp.take(a, i, axis=0)),
    "take 1d idx reshape": jax.jit(
        lambda a, i: jnp.take(a, i.reshape(-1), axis=0).reshape(i.shape)),
    "bracket 1d": jax.jit(lambda a, i: a[i.reshape(-1)].reshape(i.shape)),
    "one_hot?? no - gather f32 table": None,
}
for name, fn in variants.items():
    if fn is None:
        continue
    t = bench(fn, atlas, idx2d)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)

# f32 atlas variant (avoid u32 gather path quirks)
atlas_f = atlas.astype(jnp.float32)
fnf = jax.jit(lambda a, i: a[i.reshape(-1)].reshape(i.shape))
print(f"f32 table bracket 1d: {bench(fnf, atlas_f, idx2d)*1e3:.2f} ms",
      flush=True)
