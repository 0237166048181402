"""Do REPEATED indices serialize XLA gather/scatter on v5e?  The wq flush
sends ~80% of its 2.9M scatter indices to ONE shared drop slot, and the
texel row-gather fetches row 0 for ~90% of lanes.  Uniform-index
microbenches (prof_r3_rowgather.py) showed 5-9.7 ns/elem; this measures the
skewed distributions the real driver produces."""
import time

import jax
import jax.numpy as jnp

N = 966_656            # flush size (2 slots)
FB = 1_440_001
TBL_ROWS = 9_728
STEPS = 20


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    uni = jax.random.randint(key, (N,), 0, FB - 1, dtype=jnp.int32)
    mask = jax.random.uniform(jax.random.PRNGKey(1), (N,)) < 0.8
    skew = jnp.where(mask, FB - 1, uni)          # 80% -> one drop slot
    spread = jnp.where(mask, FB - 1 - (jnp.arange(N) % 4096), uni)
    vals = jnp.ones((N,), jnp.float32)

    def scatter(idx0):
        @jax.jit
        def go(c):
            def body(carry, _):
                fb = jnp.zeros((FB,), jnp.float32)
                i = (idx0 + carry.astype(jnp.int32)) % FB
                fb = fb.at[i].add(vals)
                return carry + fb[0].astype(jnp.int32), None
            c, _ = jax.lax.scan(body, c, None, length=STEPS)
            return c
        return go

    rkey = jax.random.randint(key, (N,), 0, TBL_ROWS, dtype=jnp.int32)
    rskew = jnp.where(mask, 0, rkey)             # 90%-ish -> row 0
    rows = jnp.arange(TBL_ROWS * 128, dtype=jnp.float32).reshape(TBL_ROWS, 128)

    def rowgather(idx0):
        @jax.jit
        def go(c):
            def body(carry, _):
                i = (idx0 + carry.astype(jnp.int32)) % TBL_ROWS
                r = rows[i]
                v = jnp.sum(r[:, :1])
                return carry + v.astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(body, c, None, length=STEPS)
            return c
        return go

    print(f"scatter uniform : {timeit(scatter(uni), jnp.int32(0)):8.2f} ms",
          flush=True)
    print(f"scatter 80%-one : {timeit(scatter(skew), jnp.int32(0)):8.2f} ms",
          flush=True)
    print(f"scatter 80%-4k  : {timeit(scatter(spread), jnp.int32(0)):8.2f} ms",
          flush=True)
    print(f"rowgath uniform : {timeit(rowgather(rkey), jnp.int32(0)):8.2f} ms",
          flush=True)
    print(f"rowgath 80%-row0: {timeit(rowgather(rskew), jnp.int32(0)):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
