import time
import numpy as np
import jax, jax.numpy as jnp

ROWS, LANE = 3776, 128
N = ROWS * LANE
TAB = 1239809
tab = jax.device_put(jnp.arange(TAB, dtype=jnp.uint32))
rng = np.random.default_rng(0)
idx_f32 = jax.device_put(jnp.asarray(
    rng.integers(0, TAB, (ROWS, LANE)).astype(np.float32)))

def run(name, mkbody):
    def f(n):
        def g(x):
            return jax.lax.fori_loop(0, n, mkbody(), x)
        gj = jax.jit(g)
        r = np.asarray(gj(idx_f32)[0, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = np.asarray(gj(idx_f32)[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best
    d = (f(22) - f(2)) / 20
    print(f"{name:38s}: {d*1e3:6.2f} ms ({N/d/1e6:.0f} M idx/s)")

# 1. f32 idx -> convert+clip -> gather -> f32 out (chained)
def mk1():
    def body(i, x):
        idx = jnp.clip(x.astype(jnp.int32), 0, TAB - 1)
        t = jnp.take(tab, idx, axis=0)
        return (t & jnp.uint32(0xFFFFF)).astype(jnp.float32)
    return body
run("f32->i32 clip->gather->f32 chain", mk1)

# 2. i32 idx chained gather
def mk2():
    def body(i, x):
        idx = jnp.clip(x.astype(jnp.int32), 0, TAB - 1)
        t = jnp.take(tab, idx, axis=0)
        return t.astype(jnp.float32)
    return body
run("same, no mask", mk2)

# 3. gather output reshaped flat (1D indices)
def mk3():
    def body(i, x):
        idx = jnp.clip(x.astype(jnp.int32).reshape(-1), 0, TAB - 1)
        t = jnp.take(tab, idx, axis=0)
        return t.reshape(ROWS, LANE).astype(jnp.float32)
    return body
run("1d flat idx gather", mk3)

# 4. smaller output: gather only 1/8 of lanes
def mk4():
    def body(i, x):
        idx = jnp.clip(x[:ROWS // 8].astype(jnp.int32), 0, TAB - 1)
        t = jnp.take(tab, idx, axis=0)
        return x.at[:ROWS // 8].set(t.astype(jnp.float32))
    return body
run("1/8-size gather + dynamic-update", mk4)

# 5. gather via one level of row-split: tab2d[idx>>7, idx&127]?
tab2d = jax.device_put(jnp.arange((TAB // 128 + 1) * 128,
                                  dtype=jnp.uint32).reshape(-1, 128))
def mk5():
    def body(i, x):
        idx = jnp.clip(x.astype(jnp.int32), 0, TAB - 1)
        r = idx >> 7
        c = idx & 127
        t = tab2d[r, c]
        return t.astype(jnp.float32)
    return body
run("2d (row,col) gather", mk5)
