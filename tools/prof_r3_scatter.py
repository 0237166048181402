"""Honest (args-passed, not closure) measurements of deposit & gather
variants, to pick the windowed-driver's primitives."""
import time

import jax
import jax.numpy as jnp

LANES = 483328
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


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pix_dup = jax.random.randint(k1, (LANES,), 0, N_PIX)
    # unique indices: a permutation slice
    perm = jax.random.permutation(k2, LANES)
    vals = jax.random.normal(k3, (LANES,))
    vals3 = jax.random.normal(k3, (LANES, 3))
    fb1 = jnp.zeros((N_PIX,))
    fb3 = jnp.zeros((N_PIX, 3))
    fbL = jnp.zeros((LANES,))
    fbL3 = jnp.zeros((LANES, 3))

    f = jax.jit(lambda fb, p, v: fb.at[p].add(v))
    print(f"add (L,) dup:            {timeit(f, fb1, pix_dup, vals):.2f} ms")
    f3 = jax.jit(lambda fb, p, v: fb.at[p].add(v))
    print(f"add (L,3) dup:           {timeit(f3, fb3, pix_dup, vals3):.2f} ms")

    fu = jax.jit(lambda fb, p, v: fb.at[p].set(v, unique_indices=True,
                                               mode="drop"))
    print(f"set (L,) unique drop:    {timeit(fu, fbL, perm, vals):.2f} ms")
    fu3 = jax.jit(lambda fb, p, v: fb.at[p].set(v, unique_indices=True,
                                                mode="drop"))
    print(f"set (L,3) unique drop:   {timeit(fu3, fbL3, perm, vals3):.2f} ms")
    fa1 = jax.jit(lambda fb, p, v: fb.at[p].add(v, unique_indices=True,
                                                mode="drop"))
    print(f"add (L,) unique drop:    {timeit(fa1, fbL, perm, vals):.2f} ms")

    # one-hot matmul deposit? n_pix too big. Sorted segment approach:
    @jax.jit
    def f_sorted(fb, p, v):
        order = jnp.argsort(p)
        return fb.at[p[order]].add(v[order])
    print(f"sort+add (L,) dup:       {timeit(f_sorted, fb1, pix_dup, vals):.2f} ms")

    # gather scaling
    tab = jax.random.randint(k1, (N_ATLAS,), 0, 2**31 - 1).astype(jnp.uint32)
    for n_idx in (61440, 483328, 3383296):
        idx = jax.random.randint(k2, (n_idx,), 0, N_ATLAS)
        g = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
        print(f"gather u32 {n_idx:>8}:     {timeit(g, tab, idx):.2f} ms")

    # gather from small table (one image only, 512K)
    tab_s = tab[:524288]
    idx = jax.random.randint(k2, (LANES,), 0, 524288)
    g2 = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
    print(f"gather u32 from 512K tab: {timeit(g2, tab_s, idx):.2f} ms")

    # gather 2D-shaped indices (rows,128)
    idx2 = jax.random.randint(k2, (LANES // 128, 128), 0, N_ATLAS)
    g3 = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
    print(f"gather u32 (rows,128):    {timeit(g3, tab, idx2):.2f} ms")


if __name__ == "__main__":
    main()
