"""Why is the SAME gather 0.064 ms standalone but ~3.8 ms inside a scan?
(prof_r3_inloop.py vs prof_gather_kernel.py).  Probe which structural
change restores the fast path in loop context: optimization_barrier,
constant indices, output layout, scatter forms ditto."""
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


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
tab = jax.random.randint(k3, (N_ATLAS,), 0, 2 ** 30).astype(jnp.uint32)
idx_const = jax.random.randint(k1, (ROWS, LANE), 0, N_ATLAS, jnp.int32)
a0 = jax.random.normal(k1, (ROWS, LANE))
fb0 = jnp.zeros((N_PIX + 1,), jnp.float32)
pix_const = jax.random.randint(k2, (2 * L,), 0, N_PIX)
vals_const = jax.random.normal(k2, (2 * L,))


# ---- standalone reference ---------------------------------------------------
g = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
print(f"standalone take 2Didx:      {timeit(g, tab, idx_const):7.3f} ms",
      flush=True)
s1 = jax.jit(lambda fb, p, v: fb.at[p].add(v))
print(f"standalone scatter (2L,):   {timeit(s1, fb0, pix_const, vals_const):7.3f} ms",
      flush=True)


def scan_probe(name, body_extra, *extra_args):
    def body(carry, _):
        a, acc = carry
        a = a * 1.000001 + 0.5
        acc = body_extra(a, acc, *extra_args)
        return (a, acc), None

    @jax.jit
    def run(a, acc):
        (a, acc), _ = jax.lax.scan(body, (a, acc), None, length=REPS)
        return a, acc

    t = timeit(run, a0, jnp.zeros((), jnp.float32))
    print(f"{name:>28}: {t/REPS:7.3f} ms/rep", flush=True)


# gather variants in scan; accumulate a scalar so nothing big is carried
def g_computed(a, acc):
    idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1)
    tx = jnp.take(tab, idx, mode="clip")
    return acc + tx[0, 0].astype(jnp.float32) * 1e-12


def g_barrier(a, acc):
    idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1)
    idx = jax.lax.optimization_barrier(idx)
    tx = jnp.take(tab, idx, mode="clip")
    tx = jax.lax.optimization_barrier(tx)
    return acc + tx[0, 0].astype(jnp.float32) * 1e-12


def g_const(a, acc):
    tx = jnp.take(tab, idx_const, mode="clip")
    return acc + (tx[0, 0].astype(jnp.float32) + a[0, 0]) * 1e-12


def g_unconsumed(a, acc):
    idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1)
    tx = jnp.take(tab, idx, mode="clip")
    return acc + jnp.sum(tx.astype(jnp.float32)) * 1e-12


scan_probe("scan gather computed", g_computed)
scan_probe("scan gather +barrier", g_barrier)
scan_probe("scan gather const idx", g_const)
scan_probe("scan gather sum-consumed", g_unconsumed)


# scatter in scan: carry the fb
def scan_scatter(name, body_extra):
    def body(carry, _):
        a, fb = carry
        a = a * 1.000001 + 0.5
        fb = body_extra(a, fb)
        return (a, fb), None

    @jax.jit
    def run(a, fb):
        (a, fb), _ = jax.lax.scan(body, (a, fb), None, length=REPS)
        return a, fb

    t = timeit(run, a0, fb0)
    print(f"{name:>28}: {t/REPS:7.3f} ms/rep", flush=True)


def s_computed(a, fb):
    v = vals_const + jnp.sum(a) * 1e-12
    return fb.at[pix_const].add(v)


def s_barrier(a, fb):
    v = vals_const + jnp.sum(a) * 1e-12
    p, v = jax.lax.optimization_barrier((pix_const, v))
    return fb.at[p].add(v)


def s_u16pack(a, fb):
    # halve index traffic: would need u16; probe i32 baseline vs nothing
    v = vals_const[:L] + jnp.sum(a) * 1e-12
    return fb.at[pix_const[:L]].add(v)


scan_scatter("scan scatter (2L,)", s_computed)
scan_scatter("scan scatter +barrier", s_barrier)
scan_scatter("scan scatter (L,)", s_u16pack)
