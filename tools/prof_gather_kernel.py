"""Probe: which per-lane dynamic-gather forms Mosaic supports in-kernel,
and how fast each is.  Decides the wq3 texel strategy (in-kernel atlas
fetch vs deferred XLA fixups).  Finding (v5e, jax 0.9):

  * jnp.take(1D table, 2D idx)        -> NotImplementedError (needs 2D)
  * jnp.take_along_axis(2D, 2D, 0)    -> works iff table rows == 8 (sublane
    gather); arbitrary N rows unsupported.
  * XLA flat take outside the kernel: 602K from 1.24M = 0.064 ms (free).
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_239_809
ROWS, LANE = 4704, 128
TILE = 32


def bench(fn, *args, trials=5):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


key = jax.random.PRNGKey(0)
idx = jax.random.randint(jax.random.PRNGKey(1), (ROWS, LANE), 0, N,
                         jnp.int32)
print("backend:", jax.default_backend(), flush=True)


def try_call(name, kernel, tab, tab_spec, check=None):
    try:
        f = pl.pallas_call(
            kernel,
            grid=(ROWS // TILE,),
            in_specs=[tab_spec,
                      pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.int32),
        )
        jf = jax.jit(lambda t, i: f(t, i))
        t, out = bench(jf, tab, idx)
        ok = "?" if check is None else bool(jnp.all(out == check))
        print(f"{name}: {t*1e3:.3f} ms  correct={ok}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = " | ".join(str(e).splitlines()[:2])[:220]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
        return False


vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

# A) 2D table (N128, 128), take_along_axis over axis 0 (sublane gather)
N128 = -(-N // LANE)
tabA = jax.random.randint(key, (N128, LANE), 0, 2**30, jnp.int32)
rowA = idx // LANE


def kA(tab_ref, idx_ref, out_ref):
    r = idx_ref[:, :] // LANE
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], r, axis=0)


try_call("take_along_axis axis0 (9686,128)", kA, tabA, vmem)

# B) lane gather within a (TILE,128) block: take_along_axis axis=1
tabB = jax.random.randint(key, (ROWS, LANE), 0, 2**30, jnp.int32)


def kB(tab_ref, idx_ref, out_ref):
    li = idx_ref[:, :] % LANE
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], li, axis=1)


try_call("take_along_axis axis1 (lane xbar)", kB, tabB, vmem,
         check=jnp.take_along_axis(tabB, idx % LANE, axis=1))

# C) jnp.take with 2D table rows: tab (N128,128), want tab[r, l] both dyn
def kC(tab_ref, idx_ref, out_ref):
    r = idx_ref[:, :] // LANE
    li = idx_ref[:, :] % LANE
    rows = jnp.take_along_axis(tab_ref[:, :], r, axis=0)
    out_ref[:, :] = jnp.take_along_axis(rows, li, axis=1)


try_call("two-level r//128 then lane xbar", kC, tabA, vmem,
         check=jnp.take_along_axis(
             jnp.take_along_axis(tabA, idx // LANE, axis=0),
             idx % LANE, axis=1))
