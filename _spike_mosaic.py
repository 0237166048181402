"""Spike: which ops does Mosaic TPU support inside a pallas kernel?"""
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

N, L = 256, 128


def try_kernel(name, body, n_in=1, dtype=jnp.float32, out_dtype=None):
    out_dtype = out_dtype or dtype
    def kernel(*refs):
        ins = [r[:, :] for r in refs[:-1]]
        refs[-1][:, :] = body(*ins)
    try:
        xs = [jnp.abs(jax.random.normal(jax.random.PRNGKey(i), (N, L))) * 0.5 + 0.25
              for i in range(n_in)]
        xs = [x.astype(dtype) for x in xs]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*xs)
        jax.block_until_ready(out)
        print(f"OK   {name}  sample={np.asarray(out)[0,0]:.4f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL {name}: {msg}")


try_kernel("sin", lambda x: jnp.sin(x))
try_kernel("cos", lambda x: jnp.cos(x))
try_kernel("log", lambda x: jnp.log(x))
try_kernel("exp", lambda x: jnp.exp(x))
try_kernel("sqrt", lambda x: jnp.sqrt(x))
try_kernel("rsqrt", lambda x: jax.lax.rsqrt(x))
try_kernel("arctan2", lambda x, y: jnp.arctan2(x, y), n_in=2)
try_kernel("arcsin", lambda x: jnp.arcsin(jnp.clip(x, -1, 1)))
try_kernel("sign", lambda x: jnp.sign(x))
try_kernel("fmod", lambda x, y: jnp.fmod(x * 3, y + 1.0), n_in=2)
try_kernel("floor", lambda x: jnp.floor(x * 5))
try_kernel("pow", lambda x, y: jnp.power(x, y), n_in=2)

# integer ops
def u32_body(x):
    s = pltpu.bitcast(x, jnp.uint32)
    s = s ^ (s >> 7)
    s = s ^ (s << 1)
    s = s ^ (s >> 9)
    return s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
try_kernel("xorshift32(bitcast f32 in)", u32_body)

def u32_direct(x):
    s = x
    s = s ^ (s >> 7)
    s = s ^ (s << 1)
    s = s ^ (s >> 9)
    return s
try_kernel("xorshift32(uint32 io)", u32_direct, dtype=jnp.uint32)

# mixed uint32 state + float out, int mul hash
def hash_body(x):
    s = x * jnp.uint32(0x9E3779B9)
    s = (s ^ (s >> 16)) * jnp.uint32(0x21F0AAAD)
    return s
try_kernel("u32 multiply hash", hash_body, dtype=jnp.uint32)

# bool select chains
try_kernel("where-chain", lambda x, y: jnp.where(x > y, x, jnp.where(x > 0.5, y, x * y)), n_in=2)

# (256,1) x (1,128) broadcast
def bcast_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = a_ref[:, :] * b_ref[:, :]
try:
    a = jnp.ones((N, 1)); b = jnp.ones((1, L))
    out = pl.pallas_call(
        bcast_kernel,
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    print("OK   (N,1)x(1,L) broadcast")
except Exception as e:
    print("FAIL broadcast:", str(e).split(chr(10))[0][:110])

# scalar SMEM param read in loop
def smem_kernel(tab_ref, x_ref, o_ref):
    def body(i, acc):
        return acc + tab_ref[i] * x_ref[:, :]
    o_ref[:, :] = jax.lax.fori_loop(0, 8, body, jnp.zeros((N, L), jnp.float32))
try:
    tab = jnp.arange(8, dtype=jnp.float32)
    x = jnp.ones((N, L))
    out = pl.pallas_call(
        smem_kernel,
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, x)
    print("OK   SMEM scalar table fori_loop, sum =", float(out[0, 0]))
except Exception as e:
    print("FAIL smem loop:", str(e).split(chr(10))[0][:110])

# pltpu prng
def prng_kernel(seed_ref, o_ref):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.prng_random_bits((N, L))
    o_ref[:, :] = bits.astype(jnp.float32) * jnp.float32(2.0 ** -32)
try:
    out = pl.pallas_call(
        prng_kernel,
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([42], jnp.int32))
    print("OK   pltpu prng", float(out.mean()))
except Exception as e:
    print("FAIL pltpu prng:", str(e).split(chr(10))[0][:110])

# VPU throughput microbench: long FMA chain
import time
def fma_kernel(x_ref, o_ref, *, iters):
    x = x_ref[:, :]
    acc = x
    for _ in range(iters):
        acc = acc * jnp.float32(1.0000001) + x
    o_ref[:, :] = acc

for shape in [(2048, 128), (8192, 128)]:
    M = shape[0]
    iters = 512
    f = pl.pallas_call(
        functools.partial(fma_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.ones(shape)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    flops = M * 128 * iters * 2
    print(f"VPU fma chain {shape}: {dt*1e6:.0f} us -> {flops/dt/1e12:.2f} Tflop/s")
