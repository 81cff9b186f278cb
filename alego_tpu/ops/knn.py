"""Batched K-nearest-neighbour search — the KD-tree replacement (T1).

The reference calls ``pcl::KdTreeFLANN::nearestKSearch`` per query point
(``/root/reference/src/LO.cpp:412,502``, ``LM.cpp:520,568``) and rebuilds trees
every frame.  Pointer-chasing trees are hostile to TPUs; dense distance
matrices on the MXU are not: ``|q - r|^2 = |q|^2 - 2 q.r + |r|^2`` turns the
search into one matmul per (query-tile, reference-chunk) pair.  Reference sets
are streamed in chunks with a running top-k, so memory stays at
``Q x (chunk + k)`` regardless of map size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e30


def knn(query: jnp.ndarray, qmask: jnp.ndarray, ref: jnp.ndarray,
        rmask: jnp.ndarray, k: int, chunk: int = 4096):
    """K nearest neighbours of each query in ref.

    query [Q, 3], ref [N, 3] with validity masks. Returns
    (dists_sq [Q, k] ascending, idx [Q, k] int32); invalid refs never win,
    invalid queries get BIG distances.
    """
    Q = query.shape[0]
    N = ref.shape[0]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        ref = jnp.concatenate([ref, jnp.zeros((pad, 3), ref.dtype)], 0)
        rmask = jnp.concatenate([rmask, jnp.zeros((pad,), bool)], 0)
    ref_c = ref.reshape(n_chunks, chunk, 3)
    rmask_c = rmask.reshape(n_chunks, chunk)

    q_sq = jnp.sum(query * query, -1, keepdims=True)  # [Q, 1]

    # Perf note: top_k/argmin over a non-128-aligned lane dimension falls off
    # a cliff on TPU (~50x), so the running-best merge keeps the big top_k on
    # the aligned [Q, chunk] matrix and merges k+k candidates separately.
    def body(carry, inp):
        best_d, best_i = carry
        rc, mc, base = inp
        r_sq = jnp.sum(rc * rc, -1)[None, :]
        d2 = q_sq - 2.0 * (query @ rc.T) + r_sq           # [Q, chunk] (MXU)
        d2 = jnp.where(mc[None, :], d2, BIG)
        neg_top, top_pos = jax.lax.top_k(-d2, k)          # aligned reduce
        cand_d = -neg_top
        cand_i = base + top_pos.astype(jnp.int32)
        cat_d = jnp.concatenate([best_d, cand_d], 1)      # [Q, 2k] tiny
        cat_i = jnp.concatenate([best_i, cand_i], 1)
        neg_m, m_pos = jax.lax.top_k(-cat_d, k)
        new_d = -neg_m
        new_i = jnp.take_along_axis(cat_i, m_pos, axis=1)
        return (new_d, new_i), None

    init = (jnp.full((Q, k), BIG, query.dtype), jnp.zeros((Q, k), jnp.int32))
    # skip trailing empty chunks (map arrays are mostly front-compacted)
    last = jnp.max(jnp.where(rmask, jnp.arange(rmask.shape[0], dtype=jnp.int32), -1))
    n_active = jnp.minimum((last + chunk) // chunk, n_chunks)

    def fbody(c, carry):
        return body(carry, (ref_c[c], rmask_c[c], c * chunk))[0]

    best_d, best_i = jax.lax.fori_loop(0, n_active, fbody, init)

    best_d = jnp.where(qmask[:, None], best_d, BIG)
    # ascending order (top_k of negatives gives ascending already)
    return jnp.maximum(best_d, 0.0), best_i


def nn1(query, qmask, ref, rmask, chunk: int = 4096):
    """1-NN specialisation: min + index-of-min (both aligned lane reductions;
    explicit argmin index tracking through scan carries is slower)."""
    Q = query.shape[0]
    N = ref.shape[0]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        ref = jnp.concatenate([ref, jnp.zeros((pad, 3), ref.dtype)], 0)
        rmask = jnp.concatenate([rmask, jnp.zeros((pad,), bool)], 0)
    ref_c = ref.reshape(n_chunks, chunk, 3)
    rmask_c = rmask.reshape(n_chunks, chunk)
    q_sq = jnp.sum(query * query, -1, keepdims=True)

    def body(carry, inp):
        best_d, best_i = carry
        rc, mc, base = inp
        r_sq = jnp.sum(rc * rc, -1)[None, :]
        d2 = q_sq - 2.0 * (query @ rc.T) + r_sq
        d2 = jnp.where(mc[None, :], d2, BIG)
        m = jnp.min(d2, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        idx = jnp.min(jnp.where(d2 <= m[:, None], iota, chunk), axis=1) + base
        better = m < best_d
        return (jnp.where(better, m, best_d),
                jnp.where(better, idx, best_i)), None

    init = (jnp.full((Q,), BIG, query.dtype), jnp.zeros((Q,), jnp.int32))
    last = jnp.max(jnp.where(rmask, jnp.arange(rmask.shape[0], dtype=jnp.int32), -1))
    n_active = jnp.minimum((last + chunk) // chunk, n_chunks)

    def fbody(c, carry):
        return body(carry, (ref_c[c], rmask_c[c], c * chunk))[0]

    best_d, best_i = jax.lax.fori_loop(0, n_active, fbody, init)
    best_d = jnp.where(qmask, best_d, BIG)
    return jnp.maximum(best_d, 0.0), best_i


def knn_best(query, qmask, ref, rmask, k: int, chunk: int = 4096):
    """Backend dispatcher: on TPU the fused Pallas kernel keeps every
    distance tile in VMEM and measures 1.9x (corner) / 4.8x (surf) faster
    than the chunked-matmul path under f32-HIGHEST (benchmarks/
    nn_shootout.py, v5e); elsewhere (CPU tests) the XLA path runs."""
    if k <= 8 and jax.default_backend() == "tpu":
        from .pallas_nn import knn_pallas
        return knn_pallas(query, qmask, ref, rmask, k=k)
    return knn(query, qmask, ref, rmask, k, chunk=chunk)


def nn1_best(query, qmask, ref, rmask, chunk: int = 4096):
    """1-NN dispatcher: Pallas on TPU (1.1-1.6x, nn_shootout.py), XLA off."""
    if jax.default_backend() == "tpu":
        from .pallas_nn import nn1_pallas
        return nn1_pallas(query, qmask, ref, rmask)
    return nn1(query, qmask, ref, rmask, chunk=chunk)


def masked_argmin_dist(query: jnp.ndarray, ref: jnp.ndarray, ref_ok: jnp.ndarray):
    """Per-query argmin over a *small* ref set with a per-query mask.

    query [Q, 3], ref [N, 3], ref_ok [Q, N] bool. Returns (d2 [Q], idx [Q]).
    Used for the ring-constrained second/third point searches (LO.cpp:419-466)
    where the eligibility mask differs per query.
    """
    q_sq = jnp.sum(query * query, -1, keepdims=True)
    r_sq = jnp.sum(ref * ref, -1)[None, :]
    d2 = q_sq - 2.0 * (query @ ref.T) + r_sq
    d2 = jnp.where(ref_ok, d2, BIG)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return jnp.maximum(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0.0), idx


def radius_count(query: jnp.ndarray, ref: jnp.ndarray, rmask: jnp.ndarray,
                 radius: float):
    """Number of refs within radius of each query (loop-closure detection)."""
    q_sq = jnp.sum(query * query, -1, keepdims=True)
    r_sq = jnp.sum(ref * ref, -1)[None, :]
    d2 = q_sq - 2.0 * (query @ ref.T) + r_sq
    return jnp.sum((d2 <= radius * radius) & rmask[None, :], axis=1)
