"""Isolate in-loop scatter-add cost (no pallas kernel involved)."""
import time

import jax
import jax.numpy as jnp

N_PIX = 480_000
ROWS, LANE = 3776, 128
N = ROWS * LANE
S = 6
f32 = jnp.float32


def bench(fn, *a):
    r = jax.block_until_ready(fn(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


key = jax.random.PRNGKey(0)
pix2d = jax.random.randint(key, (ROWS, LANE), 0, N_PIX).astype(f32)
val2d = jax.random.normal(key, (ROWS, LANE), f32)
fb0 = jnp.zeros((N_PIX,), f32)

# 1. in-loop planar scatter x3, idx from f32 2D state (like wq)
@jax.jit
def loop_scatter(pix2d, val2d, fb):
    def body(i, c):
        fbr, fbg, fbb = c
        idx = pix2d.reshape(-1).astype(jnp.int32)
        v = val2d.reshape(-1) + i
        return (fbr.at[idx].add(v), fbg.at[idx].add(v), fbb.at[idx].add(v))
    return jax.lax.fori_loop(0, 10, body, (fb, fb, fb))

t = bench(loop_scatter, pix2d, val2d, fb0)
print(f"in-loop planar scatter x3: {t/10*1e3:.2f} ms/iter", flush=True)

# 2. same with promise_in_bounds
@jax.jit
def loop_scatter_pib(pix2d, val2d, fb):
    def body(i, c):
        fbr, fbg, fbb = c
        idx = pix2d.reshape(-1).astype(jnp.int32)
        v = val2d.reshape(-1) + i
        m = "promise_in_bounds"
        return (fbr.at[idx].add(v, mode=m), fbg.at[idx].add(v, mode=m),
                fbb.at[idx].add(v, mode=m))
    return jax.lax.fori_loop(0, 10, body, (fb, fb, fb))

t = bench(loop_scatter_pib, pix2d, val2d, fb0)
print(f"in-loop planar scatter x3 promise_in_bounds: {t/10*1e3:.2f} ms/iter",
      flush=True)

# 3. slot rotation: accumulate S steps of (pix, val) into pending slabs,
#    flush with one big scatter every S steps
@jax.jit
def loop_slots(pix2d, val2d, fb):
    pend_p = jnp.zeros((S, ROWS, LANE), f32)
    pend_v = jnp.zeros((S, ROWS, LANE), f32)
    def body(i, c):
        fbr, fbg, fbb, pend_p, pend_v = c
        slot = i % S
        pend_p = jax.lax.dynamic_update_slice(
            pend_p, (pix2d + i.astype(f32))[None] % N_PIX, (slot, 0, 0))
        pend_v = jax.lax.dynamic_update_slice(
            pend_v, (val2d + i)[None], (slot, 0, 0))
        def flush(ops):
            fbr, fbg, fbb, pend_p, pend_v = ops
            idx = pend_p.reshape(-1).astype(jnp.int32)
            v = pend_v.reshape(-1)
            m = "promise_in_bounds"
            return (fbr.at[idx].add(v, mode=m), fbg.at[idx].add(v, mode=m),
                    fbb.at[idx].add(v, mode=m),
                    jnp.zeros_like(pend_p), jnp.zeros_like(pend_v))
        fbr, fbg, fbb, pend_p, pend_v = jax.lax.cond(
            slot == S - 1, flush, lambda ops: ops,
            (fbr, fbg, fbb, pend_p, pend_v))
        return fbr, fbg, fbb, pend_p, pend_v
    return jax.lax.fori_loop(0, 12, body, (fb, fb, fb, pend_p, pend_v))

t = bench(loop_slots, pix2d, val2d, fb0)
print(f"slot-rotation (S={S}, 12 iters incl 2 flushes): "
      f"{t/12*1e3:.2f} ms/iter-amortized", flush=True)

# 4. one big scatter of S*N as a standalone jit (flush-sized)
idxb = jax.random.randint(key, (S * N,), 0, N_PIX)
valb = jax.random.normal(key, (S * N,), f32)
@jax.jit
def big(fb, idx, v):
    m = "promise_in_bounds"
    return fb.at[idx].add(v, mode=m)
t = bench(big, fb0, idxb, valb)
print(f"standalone flush scatter {S*N}: {t*1e3:.2f} ms", flush=True)
