"""Masked 6-DoF Gauss-Newton / Levenberg-Marquardt with Huber IRLS (T3).

Replaces ``ceres::Solve`` with DENSE_QR + HuberLoss(0.1)
(``/root/reference/src/LO.cpp:483-492,561-569``, ``LM.cpp:612-622``): the
residual set is batched, the normal equations are a single 6x6 system built
with two einsums (MXU work), and robustness comes from iteratively reweighted
least squares with the Huber weight ``w = min(1, delta/|r|)`` — the standard
IRLS view of Ceres's corrected-Jacobian scheme.

The reference's "two-step" trick zeroes Jacobian *columns* instead of fixing
parameters: surf costs expose only z (utility.h:224-232), corner costs only
x, y, yaw (utility.h:162-167).  ``dim_mask`` reproduces that exactly: masked
columns are frozen by forcing their rows/cols of H to identity and their
gradient entries to zero, so the 6x6 solve leaves them untouched.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def gn_step(params: jnp.ndarray, r: jnp.ndarray, J: jnp.ndarray,
            weight: jnp.ndarray, dim_mask: jnp.ndarray,
            huber_delta: float, damping: float = 1e-6,
            min_count: int = 0) -> jnp.ndarray:
    """One masked GN update. weight: per-residual validity (0 = padding)."""
    w = weight * huber_weight(r, huber_delta)
    Jw = J * w[:, None]
    H = J.T @ Jw                                  # [6, 6]
    g = Jw.T @ r                                  # [6]

    m = dim_mask.astype(params.dtype)
    M = m[:, None] * m[None, :]
    H = H * M + jnp.diag(1.0 - m)
    H = H + damping * jnp.eye(6, dtype=params.dtype)
    g = g * m

    delta = -jnp.linalg.solve(H, g)
    n_active = jnp.sum(weight > 0)
    ok = (n_active >= min_count)
    delta = jnp.where(ok & jnp.all(jnp.isfinite(delta)), delta, 0.0)
    return params + delta


def solve_gn(residual_fn: Callable[[jnp.ndarray], tuple],
             params0: jnp.ndarray, iters: int, dim_mask: jnp.ndarray,
             huber_delta: float, damping: float = 1e-6,
             min_count: int = 0) -> jnp.ndarray:
    """Run ``iters`` GN iterations; residual_fn(params) -> (r, J, weight).

    Matches Ceres's fixed ``max_num_iterations`` behaviour (the reference
    relies on iteration caps, not convergence tolerances, for its runtime)."""

    def body(_, p):
        r, J, w = residual_fn(p)
        return gn_step(p, r, J, w, dim_mask, huber_delta, damping, min_count)

    return jax.lax.fori_loop(0, iters, body, params0)


# Dim masks for the reference's two-step scan-to-scan split
SURF_DIMS = jnp.array([0, 0, 1, 0, 0, 0], bool)      # z only (utility.h:224-232)
CORNER_DIMS = jnp.array([1, 1, 0, 0, 0, 1], bool)    # x, y, yaw (utility.h:162-167)
STEP_B_DIMS = jnp.array([1, 1, 1, 0, 0, 1], bool)    # union: joint second solve
FULL_DIMS = jnp.ones(6, bool)                         # scan-to-map 6-DoF
