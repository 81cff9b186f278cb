"""Pallas TPU kernels: fused 1-NN / k-NN (distance + arg-extraction) for
point clouds — the production KD-tree replacement on TPU (T1,
``pcl::KdTreeFLANN``, /root/reference/src/LO.cpp:412,502, LM.cpp:520,568).

The XLA formulation of nearest-neighbour search materialises a [Q, chunk]
distance matrix in HBM per chunk; these kernels keep each [TQ, TR] distance
tile in VMEM/registers, fusing the distance computation with the running
min/argmin (or k-best) across the reference stream, so HBM traffic drops to
the inputs + [Q]-sized outputs.  Used by the ICP inner loop, the scan-to-map
5-NN, and loop-closure correspondence search.

Occupancy skipping: every cloud in the pipeline is a fixed-capacity masked
array with the valid points front-compacted (voxel_downsample /
compact_masked outputs), and typical occupancy is 15-50% of capacity
(e.g. 159/1024 scan corners, 5436/16384 map surf points on the synthetic
circuit).  The active lengths ride in as scalar-prefetch values: grid tiles
entirely past the last valid query/reference are neither computed nor DMA'd
(their block index_map clamps to an already-resident block, which Mosaic's
revisit detection elides), so cost tracks *live* points, not capacity.

Layout notes: points are passed transposed as [3 (padded 8), N] so the large
dimension sits on 128-wide lanes; invalid reference columns carry a +BIG
penalty in row 3, which keeps mid-array mask holes exact independently of
tile skipping (skipping only ever removes tiles beyond the last valid
element).

Negative result (round 2): computing the distance tile on the MXU via the
|q|^2 - 2 q.r + |r|^2 expansion (one [TQ,8]x[8,TR] dot_general) instead of
three VPU diff-square passes was measured SLOWER at the big 1-NN shape
(4096x32768: 1.42 ms vs 0.96 ms) and a wash on the 5-NN shapes — the
contraction depth of 8 pads to the MXU's 128, so 94% of the systolic work is
zeros, and under the package's f32-HIGHEST default every matmul costs 6
bf16 passes.  The VPU path also stays exactly f32 (no cancellation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _active_len(mask) -> jnp.ndarray:
    """1 + index of the last True (0 if none): tiles past this are dead."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    return jnp.max(jnp.where(mask, idx + 1, 0))


def _clamp_tile(i, n_active, tile: int):
    """Identity for tiles that overlap [0, n_active); clamps dead tiles to
    the last live block so their DMA is elided (same-index revisit)."""
    last = jnp.maximum((n_active + tile - 1) // tile - 1, 0)
    return jnp.minimum(i, last)


def _tile_dists(q, r):
    """Squared distances [TQ, TR] for one tile pair, on the VPU (exact f32).

    q [8, TQ]: rows 0..2 coords, rows 3..7 zero.
    r [8, TR]: rows 0..2 coords, row 3 validity penalty (0 valid / BIG
    invalid), rows 4..7 zero.
    """
    d = jnp.zeros((q.shape[1], r.shape[1]), jnp.float32)
    for c in range(3):
        diff = q[c, :][:, None] - r[c, :][None, :]
        d = d + diff * diff
    return d + r[3, :][None, :]


def _nn_kernel(s_ref, q_ref, r_ref, d_ref, i_ref, *, tq: int, tr: int):
    qi = pl.program_id(0)
    j = pl.program_id(1)
    # skip tiles past the last valid query/reference; the j == 0 tile always
    # runs so the running best is initialised for every live query tile
    run = (qi * tq < s_ref[0]) & ((j == 0) | (j * tr < s_ref[1]))

    @pl.when(run)
    def _():
        q = q_ref[...]          # [8, TQ] (rows 3..7 zero)
        r = r_ref[...]          # [8, TR]

        d = _tile_dists(q, r)

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

    counts = jnp.stack([_active_len(qmask), _active_len(rmask)])

    grid = (Qp // tq, Np // tr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq),
                         lambda qi, ri, s: (0, _clamp_tile(qi, s[0], tq)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr),
                         # dead query rows (qi*tq >= live count) collapse the
                         # ref tile to block 0 so their DMAs are elided
                         # (same-index revisit) instead of re-streaming every
                         # live ref tile per dead row
                         lambda qi, ri, s: (0, _clamp_tile(
                             ri, jnp.where(qi * tq < s[0], s[1], 1), tr)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda qi, ri, s: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda qi, ri, s: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
    )
    d, i = pl.pallas_call(
        functools.partial(_nn_kernel, tq=tq, tr=tr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(counts, qT, rT)

    d = d[0, :Q]
    i = i[0, :Q]
    # dead query tiles are never written: mask their (undefined) outputs
    d = jnp.where(qmask, jnp.maximum(d, 0.0), BIG)
    return d, jnp.clip(i, 0, N - 1)


# ---------------------------------------------------------------------------
# Fused k-NN (the scan-to-map 5-NN hot spot)
# ---------------------------------------------------------------------------

def _knn_kernel(s_ref, q_ref, r_ref, d_ref, i_ref, *, tq: int, tr: int,
                k: int):
    """Per (query-tile, ref-tile): exact k smallest distances per query row
    via iterative min+mask on the VMEM-resident [TQ, TR] tile, merged with
    the running k-best across ref tiles.  Outputs are [8, TQ] (k rows used,
    rest BIG) so the f32 sublane tiling stays aligned."""
    qi = pl.program_id(0)
    j = pl.program_id(1)
    run = (qi * tq < s_ref[0]) & ((j == 0) | (j * tr < s_ref[1]))

    @pl.when(run)
    def _():
        q = q_ref[...]          # [8, TQ] (rows 3..7 zero)
        r = r_ref[...]          # [8, TR]

        d = _tile_dists(q, r)

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

    counts = jnp.stack([_active_len(qmask), _active_len(rmask)])

    grid = (Qp // tq, Np // tr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq),
                         lambda qi, ri, s: (0, _clamp_tile(qi, s[0], tq)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr),
                         # dead query rows (qi*tq >= live count) collapse the
                         # ref tile to block 0 so their DMAs are elided
                         # (same-index revisit) instead of re-streaming every
                         # live ref tile per dead row
                         lambda qi, ri, s: (0, _clamp_tile(
                             ri, jnp.where(qi * tq < s[0], s[1], 1), tr)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, tq), lambda qi, ri, s: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda qi, ri, s: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
    )
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, tq=tq, tr=tr, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Qp), jnp.float32),
            jax.ShapeDtypeStruct((8, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(counts, qT, rT)

    d = d[:k, :Q].T                       # [Q, k] ascending
    i = i[:k, :Q].T
    # dead query tiles are never written: mask their (undefined) outputs
    d = jnp.where(qmask[:, None], jnp.maximum(d, 0.0), BIG)
    return d, jnp.clip(i, 0, N - 1)
