"""Pallas TPU kernel: fused 1-NN (distance + argmin) for point clouds.

The XLA formulation of nearest-neighbour search materialises a [Q, chunk]
distance matrix in HBM per chunk; this kernel keeps each [TQ, TR] distance
tile in VMEM/registers, fusing the distance computation with the running
min/argmin across the reference stream, so HBM traffic drops to the inputs +
[Q]-sized outputs.  Used by the ICP inner loop and correspondence search.

Layout notes: points are passed transposed as [3 (padded 8), N] so the large
dimension sits on 128-wide lanes; invalid reference columns carry +BIG ranges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _nn_kernel(q_ref, r_ref, d_ref, i_ref, *, tr: int):
    j = pl.program_id(1)

    q = q_ref[...]          # [8, TQ] (rows 3..7 zero)
    r = r_ref[...]          # [8, TR]

    # squared distances [TQ, TR] accumulated on the VPU
    d = jnp.zeros((q.shape[1], r.shape[1]), jnp.float32)
    for k in range(3):
        diff = q[k, :][:, None] - r[k, :][None, :]
        d = d + diff * diff
    # row 3 of r carries the validity penalty (0 valid / BIG invalid)
    d = d + r[3, :][None, :]

    m = jnp.min(d, axis=1)
    base = j * tr
    local = jnp.argmin(d, axis=1).astype(jnp.int32) + base

    @pl.when(j == 0)
    def _():
        d_ref[0, :] = m
        i_ref[0, :] = local

    @pl.when(j > 0)
    def _():
        prev_d = d_ref[0, :]
        better = m < prev_d
        d_ref[0, :] = jnp.where(better, m, prev_d)
        i_ref[0, :] = jnp.where(better, local, i_ref[0, :])


@functools.partial(jax.jit, static_argnames=("tq", "tr", "interpret"))
def nn1_pallas(query: jnp.ndarray, qmask: jnp.ndarray, ref: jnp.ndarray,
               rmask: jnp.ndarray, tq: int = 256, tr: int = 2048,
               interpret: bool = False):
    """1-NN of query [Q, 3] in ref [N, 3] with validity masks.

    Returns (d2 [Q], idx [Q]); Q and N are padded to tile multiples
    internally.  Set ``interpret=True`` off-TPU (tests).
    """
    Q, N = query.shape[0], ref.shape[0]
    Qp = -(-Q // tq) * tq
    Np = -(-N // tr) * tr

    qT = jnp.zeros((8, Qp), jnp.float32)
    qT = qT.at[:3, :Q].set(query.T)
    rT = jnp.zeros((8, Np), jnp.float32)
    rT = rT.at[:3, :N].set(ref.T)
    rT = rT.at[3].set(BIG)
    rT = rT.at[3, :N].set(jnp.where(rmask, 0.0, BIG))

    grid = (Qp // tq, Np // tr)
    d, i = pl.pallas_call(
        functools.partial(_nn_kernel, tr=tr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(qT, rT)

    d = d[0, :Q]
    i = i[0, :Q]
    d = jnp.where(qmask, jnp.maximum(d, 0.0), BIG)
    return d, jnp.minimum(i, N - 1)
