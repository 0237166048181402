"""Does XLA gather 128-wide ROWS at bandwidth speed (DMA-like) or at the
same ~7.5 ns/row serial rate as scalar gathers?  If rows are fast, the
per-bounce texel fixup can fetch atlas rows (idx >> 7) and select the lane
(idx & 127) with a cheap one-hot reduce — ~4x cheaper than the current flat
scalar gather.  All timings chained through a scan so the measurement is a
real in-context execution (docs/PERF_NOTES.md "fake-fast" trap)."""
import time

import jax
import jax.numpy as jnp

N = 483_328          # bench lane count
TBL = 1_245_184      # atlas-sized table (multiple of 128)
STEPS = 20


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1e3, out


def main():
    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (N,), 0, TBL, dtype=jnp.int32)
    flat = jnp.arange(TBL, dtype=jnp.float32)
    rows = flat.reshape(TBL // 128, 128)
    lane_iota = jnp.arange(128, dtype=jnp.int32)[None, :]

    @jax.jit
    def flat_gather(idx):
        def body(c, _):
            i = (c.astype(jnp.int32) & (TBL - 1)) % TBL
            v = flat[i]
            return i + v.astype(jnp.int32), None
        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    @jax.jit
    def row_gather(idx):
        def body(c, _):
            i = (c.astype(jnp.int32) & (TBL - 1)) % TBL
            r = rows[i >> 7]                       # (N, 128) row fetch
            col = i & 127
            v = jnp.sum(jnp.where(lane_iota == col[:, None], r, 0.0), axis=1)
            return i + v.astype(jnp.int32), None
        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    @jax.jit
    def take_rows_only(idx):
        def body(c, _):
            i = (c.astype(jnp.int32) & (TBL - 1)) % TBL
            r = rows[i >> 7]
            v = r[:, 0]
            return i + v.astype(jnp.int32), None
        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    for name, fn in [("flat scalar gather", flat_gather),
                     ("row gather + onehot", row_gather),
                     ("row gather only", take_rows_only)]:
        ms, _ = timeit(fn, idx0)
        print(f"{name:>22}: {ms:7.3f} ms/step  ({ms / N * 1e6:6.2f} ns/elem)",
              flush=True)


if __name__ == "__main__":
    main()
