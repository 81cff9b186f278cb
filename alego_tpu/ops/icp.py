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

from .eig3 import rotation_from_covariance
from .knn import nn1_best as _nn1


class ICPResult(NamedTuple):
    transform: jnp.ndarray   # [4, 4] source -> target
    fitness: jnp.ndarray     # scalar mean squared distance
    converged: jnp.ndarray   # bool: criterion-based (PCL hasConverged)
    iters: jnp.ndarray       # int32 iterations executed


def _rigid_from_correspondences(src, tgt, w):
    """Weighted Kabsch: best R, t aligning src -> tgt."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_t = jnp.sum(tgt * w[:, None], 0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (tgt - mu_t)
    # closed-form Kabsch (eig3.rotation_from_covariance): jnp.linalg.svd on
    # a lone 3x3 is a ~0.09 ms serial custom call on TPU — x100 ICP
    # iterations it dominated the whole loop-closure attempt
    R = rotation_from_covariance(S)
    t = mu_t - R @ mu_s
    return R, t


def icp_point_to_point(src: jnp.ndarray, src_valid: jnp.ndarray,
                       tgt: jnp.ndarray, tgt_valid: jnp.ndarray,
                       iters: int, max_corr_dist: float,
                       translation_eps: float = 1e-6,
                       chunk: int = 4096,
                       T0: jnp.ndarray | None = None,
                       fail_after_max_iter: bool = False) -> ICPResult:
    """Align masked source cloud to masked target cloud from ``T0``.

    ``converged`` follows PCL's ``DefaultConvergenceCriteria`` semantics
    (the reference gates loop acceptance on ``icp.hasConverged()``,
    LM.cpp:842): true when the loop exits on the transformation-epsilon
    criterion — incremental translation^2 <= eps OR incremental rotation
    within 1-eps of identity — and, as in PCL's default
    (``failure_after_max_iter = false``), also when the iteration budget is
    exhausted; set ``fail_after_max_iter=True`` for the stricter gate.
    Always false when no correspondence fell inside ``max_corr_dist`` or the
    fitness is non-finite.
    """
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
        # PCL epsilon criteria on the INCREMENTAL transform: translation^2
        # and cos(rotation angle) = (trace(R)-1)/2
        trans_small = jnp.sum(t * t) <= translation_eps
        cos_rot = (jnp.trace(R) - 1.0) * 0.5
        rot_small = cos_rot >= (1.0 - translation_eps)
        eps_conv = trans_small & rot_small
        return T_new, eps_conv, it + 1, w.sum()

    def cond(state):
        _, eps_conv, it, _ = state
        return (it < iters) & ~eps_conv

    T, eps_conv, it, n_corr = jax.lax.while_loop(
        cond, body, (T_init, jnp.bool_(False), jnp.int32(0),
                     jnp.asarray(0.0, dtype)))

    moved = src @ T[:3, :3].T + T[:3, 3]
    d2, _ = _nn1(moved, src_valid, tgt, tgt_valid, chunk=chunk)
    nsrc = jnp.maximum(jnp.sum(src_valid), 1)
    fitness = jnp.sum(jnp.where(src_valid, d2, 0.0)) / nsrc
    criteria_ok = eps_conv if fail_after_max_iter else jnp.bool_(True)
    converged = (n_corr > 0) & jnp.isfinite(fitness) & criteria_ok
    return ICPResult(transform=T, fitness=fitness, converged=converged,
                     iters=it)
