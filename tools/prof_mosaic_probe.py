"""Mosaic feature probe: lane ranking via MXU triangular matmuls, SMEM
scratch persistence across the sequential grid, SMEM outputs."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE, TILE, GRID = 32, 128, 8, 4


def _rank(d):
    """Exclusive row-major prefix count of d (tile, 128) via 3 MXU matmuls."""
    t = d.shape[0]
    jl = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    kl = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    U = (jl < kl).astype(jnp.float32)          # strict upper: k<j contributes
    O = jnp.ones((LANE, LANE), jnp.float32)
    jr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    L = (kr < jr).astype(jnp.float32)          # strict lower for row offsets
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return mm(d, U) + mm(L, mm(d, O))


def kern(cnt_in, dead, rank_out, cnt_out, smem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        smem[0] = cnt_in[0]

    d = dead[:, :]
    rank_out[:, :] = _rank(d) + smem[0].astype(jnp.float32)
    smem[0] = smem[0] + jnp.sum(d).astype(jnp.int32)

    @pl.when(i == GRID - 1)
    def _():
        cnt_out[0] = smem[0]


@jax.jit
def run(dead, cnt):
    return pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(cnt, dead)


key = jax.random.PRNGKey(0)
dead = (jax.random.uniform(key, (ROWS, LANE)) < 0.3).astype(jnp.float32)
cnt = jnp.array([100], jnp.int32)
rank, cnt_out = run(dead, cnt)
d = np.asarray(dead)
flat = d.reshape(GRID, TILE * LANE).reshape(-1)
expect = 100 + np.cumsum(flat) - flat
got = np.asarray(rank).reshape(GRID, TILE * LANE).reshape(-1)
ok = np.allclose(got[flat > 0], expect[flat > 0])
print("rank ok:", ok, " cnt:", int(cnt_out[0]), "expect", 100 + int(flat.sum()))
