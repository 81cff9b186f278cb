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


# ---------------------------------------------------------------------------
# Fused k-NN (the scan-to-map 5-NN hot spot)
# ---------------------------------------------------------------------------

def _knn_kernel(q_ref, r_ref, d_ref, i_ref, *, tr: int, k: int):
    """Per (query-tile, ref-tile): exact k smallest distances per query row
    via iterative min+mask on the VMEM-resident [TQ, TR] tile, merged with
    the running k-best across ref tiles.  Outputs are [8, TQ] (k rows used,
    rest BIG) so the f32 sublane tiling stays aligned."""
    j = pl.program_id(1)

    q = q_ref[...]          # [8, TQ] (rows 3..7 zero)
    r = r_ref[...]          # [8, TR]

    d = jnp.zeros((q.shape[1], r.shape[1]), jnp.float32)
    for c in range(3):
        diff = q[c, :][:, None] - r[c, :][None, :]
        d = d + diff * diff
    d = d + r[3, :][None, :]          # validity penalty row

    base = j * tr
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    loc_d, loc_i = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1)
        a = jnp.argmin(d, axis=1).astype(jnp.int32)
        loc_d.append(m)
        loc_i.append(a + base)
        d = jnp.where(cols == a[:, None], BIG, d)
    pad = [jnp.full_like(loc_d[0], BIG)] * (8 - k)
    ipad = [jnp.zeros_like(loc_i[0])] * (8 - k)

    @pl.when(j == 0)
    def _():
        d_ref[...] = jnp.stack(loc_d + pad)
        i_ref[...] = jnp.stack(loc_i + ipad)

    @pl.when(j > 0)
    def _():
        cat_d = jnp.concatenate([d_ref[...][:k], jnp.stack(loc_d)], 0)
        cat_i = jnp.concatenate([i_ref[...][:k], jnp.stack(loc_i)], 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 0)
        out_d, out_i = [], []
        for _ in range(k):
            m = jnp.min(cat_d, axis=0)
            a = jnp.argmin(cat_d, axis=0).astype(jnp.int32)
            hit = rows == a[None, :]
            out_d.append(m)
            # one-hot gather (take_along_axis has no Pallas lowering)
            out_i.append(jnp.sum(jnp.where(hit, cat_i, 0), axis=0))
            cat_d = jnp.where(hit, BIG, cat_d)
        d_ref[...] = jnp.stack(out_d + pad)
        i_ref[...] = jnp.stack(out_i + ipad)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "interpret"))
def knn_pallas(query: jnp.ndarray, qmask: jnp.ndarray, ref: jnp.ndarray,
               rmask: jnp.ndarray, k: int = 5, tq: int = 256, tr: int = 2048,
               interpret: bool = False):
    """k-NN of query [Q, 3] in ref [N, 3] with validity masks; k <= 8.

    Returns (d2 [Q, k] ascending, idx [Q, k]) — same contract as
    ops.knn.knn, but the [TQ, TR] distance tiles never leave VMEM (the XLA
    path round-trips every [Q, chunk] matrix through HBM for top_k)."""
    assert k <= 8
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
        functools.partial(_knn_kernel, tr=tr, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda qi, ri: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Qp), jnp.float32),
            jax.ShapeDtypeStruct((8, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(qT, rT)

    d = d[:k, :Q].T                       # [Q, k] ascending
    i = i[:k, :Q].T
    d = jnp.where(qmask[:, None], jnp.maximum(d, 0.0), BIG)
    return d, jnp.minimum(i, N - 1)
