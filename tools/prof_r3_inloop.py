"""In-LOOP (scan-context) cost of gather/scatter variants, measured as the
delta over a dense baseline body.  Standalone, XLA gathers are free
(0.064 ms — prof_gather_kernel.py) but inside the wq loop the same gather
bills ~3.5 ms and the deposit scatter ~39 ms (prof_r3_wqw.py): this script
isolates which formulation (flat vs 2D index shapes, dup-add vs sorted vs
unique-drop) keeps the fast path inside a loop."""
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


def scan_body(extra):
    """jit(scan of REPS x (dense mix + extra(state))), so `extra` runs in
    loop context; returns ms per rep after subtracting the dense baseline
    later."""
    def body(carry, _):
        a, b, fb = carry
        a = a * 1.000001 + b * 0.5
        b = jnp.where(a > b, b + 0.25, b * 0.99)
        fb = extra(a, b, fb)
        return (a, b, fb), None

    @jax.jit
    def run(a, b, fb):
        (a, b, fb), _ = jax.lax.scan(body, (a, b, fb), None, length=REPS)
        return a, b, fb
    return run


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    a0 = jax.random.normal(k1, (ROWS, LANE))
    b0 = jax.random.normal(k2, (ROWS, LANE))
    tab = jax.random.randint(k3, (N_ATLAS,), 0, 2 ** 30).astype(jnp.uint32)
    tab2d = tab[: (N_ATLAS // LANE) * LANE].reshape(-1, LANE)
    fb0 = jnp.zeros((N_PIX + 1, 3), jnp.float32)
    fb1 = jnp.zeros((N_PIX + 1,), jnp.float32)

    base = scan_body(lambda a, b, fb: fb)
    t_base = timeit(base, a0, b0, fb0)
    print(f"baseline dense scan: {t_base:.2f} ms", flush=True)

    def report(name, extra, fb=fb0):
        t = timeit(scan_body(extra), a0, b0, fb)
        print(f"{name:>34}: {(t - t_base)/REPS:7.3f} ms/rep", flush=True)

    # ---- gathers -----------------------------------------------------------
    def g_flat(a, b, fb):
        idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1).reshape(-1)
        tx = tab[idx].reshape(ROWS, LANE)
        return fb + jnp.sum(tx.astype(jnp.float32)) * 1e-12

    def g_2d(a, b, fb):
        idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1)
        tx = jnp.take(tab, idx, mode="clip")
        return fb + jnp.sum(tx.astype(jnp.float32)) * 1e-12

    def g_2row(a, b, fb):
        idx = jnp.clip(a.astype(jnp.int32), 0, N_ATLAS - 1)
        r = idx // LANE
        c = idx % LANE
        rows = jnp.take(tab2d, r, axis=0, mode="clip")   # (ROWS,LANE,LANE)?!
        tx = jnp.take_along_axis(
            rows.reshape(ROWS * LANE, LANE), c.reshape(-1, 1), axis=1)
        return fb + jnp.sum(tx.astype(jnp.float32)) * 1e-12

    report("gather flat idx", g_flat)
    report("gather 2D idx", g_2d)

    # ---- scatters (once per scan rep, like a per-bounce deposit) ----------
    pix = jax.random.randint(k1, (2 * L,), 0, N_PIX)
    pix2d = pix.reshape(-1, LANE)
    vals3 = jax.random.normal(k2, (2 * L, 3))
    vals1 = vals3[:, 0]

    def s_dup3(a, b, fb):
        v = vals3 + jnp.sum(a) * 1e-12
        return fb.at[pix].add(v)

    def s_dup1_fb1(a, b, fb):
        v = vals1 + jnp.sum(a) * 1e-12
        return fb.at[pix].add(v)

    def s_sorted3(a, b, fb):
        v = vals3 + jnp.sum(a) * 1e-12
        order = jnp.argsort(pix)
        return fb.at[pix[order]].add(v[order])

    def s_unique_drop3(a, b, fb):
        # unique-claim scatter: rows are unique by construction here (use
        # iota), models a seg-summed flush
        v = vals3 + jnp.sum(a) * 1e-12
        idx = jnp.arange(2 * L) % (N_PIX + 1)
        return fb.at[idx].add(v, unique_indices=True, mode="drop")

    report("scatter-add dup (2L,3)", s_dup3)
    report("scatter-add dup (2L,) fb1", s_dup1_fb1, fb=fb1)
    report("scatter-add sorted (2L,3)", s_sorted3)
    report("scatter-add unique drop (2L,3)", s_unique_drop3)

    # segment-sum formulation: sort by pixel then scatter unique positions
    def s_sortseg(a, b, fb):
        v = vals3 + jnp.sum(a) * 1e-12
        order = jnp.argsort(pix)
        p = pix[order]
        vv = v[order]
        seg = jnp.cumsum(
            jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             (p[1:] != p[:-1]).astype(jnp.int32)]))
        summed = jax.ops.segment_sum(vv, seg, num_segments=2 * L)
        first = jax.ops.segment_max(p, seg, num_segments=2 * L)
        return fb.at[jnp.clip(first, 0, N_PIX)].add(
            summed, unique_indices=True, mode="drop")

    report("sort+segsum+unique (2L,3)", s_sortseg)

    # bincount-style one-hot matmul is impossible at N_PIX; but a sort of
    # (2L,) alone for reference:
    def s_sortonly(a, b, fb):
        v = jnp.sort(pix + jnp.int32(jnp.sum(a) * 1e-12))
        return fb + v[0] * 1e-12

    report("argsortless sort (2L,)", s_sortonly)


if __name__ == "__main__":
    main()
