"""Cost of the XLA glue ops the queue renderer needs at K-step boundaries:
scatter-add (deposit flush), cumsum (refill fallback), argsort (compaction
fallback) at bench shapes."""
import time

import jax
import jax.numpy as jnp

N_PIX = 480_000
LANES = 602_112


def bench(fn, *args, trials=3):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


key = jax.random.PRNGKey(0)
for n_ev in (LANES, 2 * LANES, 6 * LANES):
    idx = jax.random.randint(key, (n_ev,), 0, N_PIX)
    vals = jax.random.normal(key, (n_ev, 3), jnp.float32)
    fb = jnp.zeros((N_PIX, 3), jnp.float32)
    f = jax.jit(lambda fb, i, v: fb.at[i].add(v))
    t = bench(f, fb, idx, vals)
    print(f"scatter-add {n_ev} -> {N_PIX}: {t*1e3:.2f} ms", flush=True)

x = jax.random.normal(key, (LANES,), jnp.float32)
t = bench(jax.jit(jnp.cumsum), x)
print(f"cumsum {LANES}: {t*1e3:.2f} ms", flush=True)

x2 = jax.random.normal(key, (4704, 128), jnp.float32)
t = bench(jax.jit(lambda a: jnp.cumsum(a.reshape(-1))), x2)
print(f"cumsum reshape (4704,128): {t*1e3:.2f} ms", flush=True)

t = bench(jax.jit(lambda a: jnp.argsort(a)), x)
print(f"argsort {LANES}: {t*1e3:.2f} ms", flush=True)

# gather of lane-state by sorted order (compaction fallback cost, 1 array)
order = jnp.argsort(x)
t = bench(jax.jit(lambda a, o: a[o]), x, order)
print(f"gather {LANES} (1 array): {t*1e3:.2f} ms", flush=True)
