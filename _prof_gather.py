import time
import numpy as np
import jax, jax.numpy as jnp

ROWS, LANE = 3776, 128
N = ROWS * LANE
TAB = 1239809

def slope(mk_idx, name):
    tab = jnp.arange(TAB, dtype=jnp.uint32)
    idx0 = mk_idx()
    def f(n):
        def g(idx):
            s = jnp.uint32(0)
            def body(i, carry):
                s, idx = carry
                t = jnp.take(tab, idx, axis=0)
                # rotate indices so iterations aren't CSE'd
                return s + t[0, 0], (idx + 1) % TAB
            s, _ = jax.lax.fori_loop(0, n, body, (s, idx))
            return s
        gj = jax.jit(g)
        r = int(gj(idx0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = int(gj(idx0))
            best = min(best, time.perf_counter() - t0)
        return best
    d = (f(22) - f(2)) / 20
    print(f"{name:28s}: {d*1e3:7.2f} ms/gather ({N/d/1e6:.0f} M idx/s)")

rng = np.random.default_rng(0)
slope(lambda: jnp.asarray(rng.integers(0, TAB, (ROWS, LANE)), jnp.int32),
      "random idx")
slope(lambda: jnp.zeros((ROWS, LANE), jnp.int32), "all-zero idx")
def sparse():
    a = np.zeros((ROWS, LANE), np.int64)
    m = rng.random((ROWS, LANE)) < 0.05
    a[m] = rng.integers(0, TAB, m.sum())
    return jnp.asarray(a, jnp.int32)
slope(sparse, "5% random, 95% zero")
def local():
    # random but within one image region (locality like real hits)
    a = rng.integers(0, 1 << 16, (ROWS, LANE))
    return jnp.asarray(a, jnp.int32)
slope(local, "random within 64K window")
