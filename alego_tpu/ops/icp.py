"""Batched point-to-point ICP (T5 — ``pcl::IterativeClosestPoint`` equivalent).

The reference uses PCL ICP for loop-closure verification with
maxCorrespondenceDistance 100, 100 iterations, epsilon 1e-6
(``/root/reference/src/LM.cpp:818-840``).  TPU-native: each iteration is one
MXU distance matrix (NN search) + a masked Kabsch/SVD rigid update, iterated
under ``lax.while_loop`` with the reference's translation-epsilon early stop.
Fitness matches ``getFitnessScore()``: mean squared NN distance over source
points (LM.cpp:839).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .knn import nn1 as _nn1_xla


def _nn1(query, qmask, ref, rmask, chunk=4096):
    """1-NN dispatcher. The fused Pallas kernel (ops/pallas_nn) matches the
    XLA chunked scan standalone but measured slower inside this while_loop
    context on v5e, so the XLA path stays default; flip here to experiment."""
    return _nn1_xla(query, qmask, ref, rmask, chunk=chunk)


class ICPResult(NamedTuple):
    transform: jnp.ndarray   # [4, 4] source -> target
    fitness: jnp.ndarray     # scalar mean squared distance
    converged: jnp.ndarray   # bool
    iters: jnp.ndarray       # int32 iterations executed


def _rigid_from_correspondences(src, tgt, w):
    """Weighted Kabsch: best R, t aligning src -> tgt."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_t = jnp.sum(tgt * w[:, None], 0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (tgt - mu_t)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], S.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = mu_t - R @ mu_s
    return R, t


def icp_point_to_point(src: jnp.ndarray, src_valid: jnp.ndarray,
                       tgt: jnp.ndarray, tgt_valid: jnp.ndarray,
                       iters: int, max_corr_dist: float,
                       translation_eps: float = 1e-6,
                       chunk: int = 4096,
                       T0: jnp.ndarray | None = None) -> ICPResult:
    """Align masked source cloud to masked target cloud from ``T0``."""
    dtype = src.dtype
    I4 = jnp.eye(4, dtype=dtype)
    T_init = I4 if T0 is None else T0
    max_d2 = max_corr_dist * max_corr_dist

    def body(state):
        T, _, it, _ = state
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2, idx = _nn1(moved, src_valid, tgt, tgt_valid, chunk=chunk)
        w = (src_valid & (d2 < max_d2)).astype(dtype)
        R, t = _rigid_from_correspondences(moved, tgt[idx], w)
        dT = I4.at[:3, :3].set(R).at[:3, 3].set(t)
        T_new = dT @ T
        shift = jnp.sum(t * t)
        return T_new, shift, it + 1, w.sum()

    def cond(state):
        _, shift, it, _ = state
        return (it < iters) & ((it == 0) | (shift > translation_eps))

    T, shift, it, n_corr = jax.lax.while_loop(
        cond, body, (T_init, jnp.asarray(1.0, dtype), jnp.int32(0),
                     jnp.asarray(0.0, dtype)))

    moved = src @ T[:3, :3].T + T[:3, 3]
    d2, _ = _nn1(moved, src_valid, tgt, tgt_valid, chunk=chunk)
    nsrc = jnp.maximum(jnp.sum(src_valid), 1)
    fitness = jnp.sum(jnp.where(src_valid, d2, 0.0)) / nsrc
    converged = (n_corr > 0) & jnp.isfinite(fitness)
    return ICPResult(transform=T, fitness=fitness, converged=converged, iters=it)


def icp_coarse_to_fine(src: jnp.ndarray, src_valid: jnp.ndarray,
                       tgt: jnp.ndarray, tgt_valid: jnp.ndarray,
                       iters: int, max_corr_dist: float,
                       translation_eps: float = 1e-6,
                       chunk: int = 4096, decimate: int = 4,
                       fine_iters: int = 8) -> ICPResult:
    """Two-stage ICP: bulk convergence on a 1/``decimate`` source subsample,
    short refinement + fitness on the full cloud.  ~3x cheaper per loop
    attempt; final transform and PCL-style fitness semantics unchanged."""
    sub = jax.lax.broadcasted_iota(jnp.int32, src_valid.shape, 0) % decimate == 0
    coarse = icp_point_to_point(src, src_valid & sub, tgt, tgt_valid,
                                iters, max_corr_dist, translation_eps, chunk)
    return icp_point_to_point(src, src_valid, tgt, tgt_valid, fine_iters,
                              max_corr_dist, translation_eps, chunk,
                              T0=coarse.transform)
