"""Factored O(N) solve for the pose-graph chain Hessian (iSAM2's job, T4).

The chain + prior part of the pose-graph normal equations is EXACTLY

    T = J^T Info J,      J = Dg @ B                       (square, invertible)

where row 0 of ``J`` is the prior block ``Jr_0`` on node 0 and row ``i`` is
the between factor (i-1, i) with blocks ``Jr_i @ [-Ad_i | I]`` (``Ad_i`` the
adjoint of the measured relative pose, ``Jr_i ~ I`` the inverse right
Jacobian).  ``Dg = blockdiag(Jr_i)`` and ``B = I - subdiag(Ad_i)`` is unit
block-bidiagonal, so

    T^{-1} = B^{-1} Dg^{-1} Info^{-1} Dg^{-T} B^{-T}

is two block-bidiagonal triangular solves plus per-block 6x6 solves and a
diagonal scale.  The triangular solves are affine prefix recursions
``x_i = A_i x_{i-1} + b_i`` — an ``associative_scan`` over 6x6 affine maps,
O(log N) depth of batched small matmuls (MXU-shaped).

Numerics: round 1 showed unpivoted block-Thomas elimination of the *formed*
Hessian loses ~1e0 relative accuracy in f32 on stiff chains: forming
``J^T Info J`` squares the conditioning (cond(T) = cond(J)^2 * cond(Info),
~1e10 at chain sigma 1e-4).  This factored path never forms T — each step is
conditioned like the pose chain itself (applying B^{-1} is just propagating
increments along the chain) — and matches a pivoted f64 dense solve to ~1e-6
relative in f32 at N = 2048 (tests/test_pose_graph_fast.py).

Loop closures add a low-rank term ``Vs Vs^T``; models/pose_graph folds them
in with the matrix inversion lemma using this solver for the 1 + 6L
right-hand sides.

Replaces gtsam::ISAM2 (``/root/reference/src/LM.cpp:197-204,659-662``) as the
production solve; reference semantics (full relinearised solve on loop
events) per LM.cpp:879-882.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_scan_carry(A: jnp.ndarray, b: jnp.ndarray, reverse: bool = False):
    """Prefix-compose the affine recursion x_i = A_i @ x_{i-1} + b_i,
    returning both composed maps.

    A [N, 6, 6], b [N, 6, K] -> (A_out [N, 6, 6], x [N, 6, K]) where
    ``A_out[i]`` is the product A_i @ ... @ A_0 (reversed analogously) —
    the transport needed to fold in an out-of-range boundary value:
    true_x[i] = x[i] + A_out[i] @ x_boundary.  With ``reverse=True`` the
    recursion is x_i = A_i @ x_{i+1} + b_i.
    """

    def combine(lo, hi):
        A_lo, b_lo = lo
        A_hi, b_hi = hi
        return A_hi @ A_lo, A_hi @ b_lo + b_hi

    return jax.lax.associative_scan(combine, (A, b), reverse=reverse)


def affine_scan(A: jnp.ndarray, b: jnp.ndarray, reverse: bool = False
                ) -> jnp.ndarray:
    """Prefix-compose the affine recursion x_i = A_i @ x_{i-1} + b_i.

    A [N, 6, 6], b [N, 6, K] -> x [N, 6, K].  With ``reverse=True`` computes
    the suffix recursion x_i = A_i @ x_{i+1} + b_i instead.
    """
    return affine_scan_carry(A, b, reverse=reverse)[1]


def solve_small_refined(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Small dense solve in ANY float dtype on TPU.

    XLA:TPU's LuDecomposition implements only F32/C64, so an f64
    ``jnp.linalg.solve`` fails to lower.  Factor in f32 and recover the
    input precision with one iterative-refinement step (classic
    Wilkinson): for the near-identity / moderately-conditioned blocks this
    serves (Jr ~ I, Woodbury cores), one step reaches ~full f64 accuracy.
    """
    A32 = A.astype(jnp.float32)
    X0 = jnp.linalg.solve(A32, B.astype(jnp.float32)).astype(A.dtype)
    R = B - A @ X0
    corr = jnp.linalg.solve(A32, R.astype(jnp.float32)).astype(A.dtype)
    return X0 + corr


def chain_solve(Ad: jnp.ndarray, Jr: jnp.ndarray, info: jnp.ndarray,
                rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (J^T diag(info) J) x = rhs for the block-bidiagonal chain J.

    Ad   [N, 6, 6]: subdiagonal couplings; Ad[0] must be zero (prior row).
    Jr   [N, 6, 6]: invertible per-row factor blocks (~ I).
    info [N, 6]:    per-row positive diagonal information.
    rhs  [N, 6, K].

    Runs in the dtype of its inputs: pass f64 operands (under
    ``jax.enable_x64``) for the precise path — the scans are f64-capable on
    TPU, and the small dense solves go through :func:`solve_small_refined`.
    """
    AdT = jnp.swapaxes(Ad, -1, -2)
    JrT = jnp.swapaxes(Jr, -1, -2)
    # y = B^{-T} rhs: y_i = rhs_i + Ad_{i+1}^T y_{i+1}
    M = jnp.concatenate([AdT[1:], jnp.zeros_like(AdT[:1])], axis=0)
    y = affine_scan(M, rhs, reverse=True)
    # diagonal part: Dg^{-1} Info^{-1} Dg^{-T}
    if Ad.dtype == jnp.float32:
        u = jnp.linalg.solve(Jr, jnp.linalg.solve(JrT, y) / info[..., None])
    else:
        u = solve_small_refined(
            Jr, solve_small_refined(JrT, y) / info[..., None])
    # x = B^{-1} u: x_i = u_i + Ad_i x_{i-1}
    return affine_scan(Ad, u, reverse=False)
