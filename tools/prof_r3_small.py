"""Small-size scaling of in-loop (scan-context) gather/scatter: is cost
~7.5 ns/element down to small sizes, or is there a per-op floor?  Decides
the compact-the-texel-gather design (only ~2% of lanes need a texel per
bounce).  Also: chained dependency so the tunnel cannot fake-complete."""
import time

import jax
import jax.numpy as jnp

ROWS, LANE = 3776, 128
L = ROWS * LANE
N_PIX = 480000
N_ATLAS = 1239809
REPS = 8


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tab = jax.random.randint(k3, (N_ATLAS,), 0, 2 ** 30).astype(jnp.uint32)
    a0 = jax.random.normal(k1, (ROWS, LANE))

    def probe(extra):
        def body(carry, _):
            a, acc = carry
            a = a * 1.000001 + 0.5
            acc = extra(a, acc)
            return (a, acc), None

        @jax.jit
        def run(a, acc):
            (a, acc), _ = jax.lax.scan(body, (a, acc), None, length=REPS)
            return a, acc
        return timeit(run, a0, jnp.zeros((), jnp.float32))

    base = probe(lambda a, acc: acc)
    print(f"baseline: {base:.3f} ms total", flush=True)

    for n_idx in (4096, 16384, 65536, 262144, 483328):
        def g(a, acc, n_idx=n_idx):
            # idx depends on a (chained) — cannot be hoisted or faked
            idx = jnp.clip(a.reshape(-1)[:n_idx].astype(jnp.int32) * 7919,
                           0, N_ATLAS - 1)
            tx = jnp.take(tab, idx, mode="clip")
            return acc + tx.astype(jnp.float32)[0] * 1e-12
        t = probe(g)
        per = (t - base) / REPS
        print(f"in-scan gather {n_idx:>7}: {per:7.3f} ms "
              f"({per/n_idx*1e6:6.1f} ns/elem)", flush=True)

    fbsz = 3 * N_PIX
    for n_row in (16384, 65536, 262144, 966656):
        def s(a, acc, n_row=n_row):
            idx = jnp.clip(a.reshape(-1)[:n_row].astype(jnp.int32) * 104729,
                           0, fbsz - 1)
            v = a.reshape(-1)[:n_row]
            fb = jnp.zeros((fbsz,), jnp.float32).at[idx].add(v)
            return acc + fb[0] * 1e-12
        t = probe(s)
        per = (t - base) / REPS
        print(f"in-scan scatter {n_row:>7}: {per:7.3f} ms "
              f"({per/n_row*1e6:6.1f} ns/elem)", flush=True)


if __name__ == "__main__":
    main()
