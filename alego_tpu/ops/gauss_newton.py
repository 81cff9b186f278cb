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


# NB: an unrolled scalar Cholesky was tried for the 6x6 solve and made the
# TPU compiler take >5 minutes (long scalar dependency chains); linalg.solve
# compiles in <1 s and runs at the same speed inside the GN loop.


def gn_step(params: jnp.ndarray, r: jnp.ndarray, J: jnp.ndarray,
            weight: jnp.ndarray, dim_mask: jnp.ndarray,
            huber_delta: float, damping: float = 1e-6,
            min_count: int = 0) -> jnp.ndarray:
    """One masked GN update. weight: per-residual validity (0 = padding).

    Non-finite rows are DROPPED, not allowed to freeze the solve: a single
    NaN residual/Jacobian entry would otherwise poison H (0 * NaN = NaN)
    and the non-finite guards then zero the whole update — round 2's
    mapping silently ran inert for whole frame windows this way (see
    ops/eig3.plane_fit).  The row sanitisation costs two elementwise masks.
    """
    row_ok = jnp.isfinite(r) & jnp.all(jnp.isfinite(J), axis=-1)
    r = jnp.where(row_ok, r, 0.0)
    J = jnp.where(row_ok[:, None], J, 0.0)
    weight = weight * row_ok.astype(weight.dtype)
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


def degeneracy_projector(H: jnp.ndarray, eig_floor: float) -> jnp.ndarray:
    """LOAM-style degeneracy guard: P = V diag(lam > floor) V^T.

    Scan-to-map solves can be rank-deficient (first frames against a single
    sparse keyframe, corridors, open fields): H then has near-zero
    eigenvalues and the raw normal-equation step is unbounded noise along the
    unobservable directions.  Upstream LeGO-LOAM computes exactly this
    eigenvalue test (`isDegenerate`, eigenvalue < 100) and zeroes the update
    along degenerate eigenvectors; the reference swaps that for Ceres's
    trust region (LM.cpp:612-622), which bounds the same directions.
    Projecting the update (delta <- P delta) keeps the well-observed
    directions converging while freezing the unobservable ones at the prior.
    """
    # eigh of a non-finite H poisons every later update through P — fall
    # back to a conservative full-freeze (P = 0, i.e. keep the warm start)
    finite = jnp.all(jnp.isfinite(H))
    lam, V = jnp.linalg.eigh(jnp.where(finite, H, jnp.eye(H.shape[0], dtype=H.dtype)))
    keep = (lam > eig_floor).astype(H.dtype) * finite.astype(H.dtype)
    return (V * keep[None, :]) @ V.T


def solve_gn(residual_fn: Callable[[jnp.ndarray], tuple],
             params0: jnp.ndarray, iters: int, dim_mask: jnp.ndarray,
             huber_delta: float, damping: float = 1e-6,
             min_count: int = 0, param_tol: float = 1e-4,
             eig_floor: float = 0.0,
             prior_weight: float = 0.0,
             max_step: float = 1.0) -> jnp.ndarray:
    """GN with ``iters`` max iterations and Ceres-style early stopping:
    the loop exits once the update falls below ``param_tol`` (Ceres stops on
    its tolerances well before max_num_iterations in the common case —
    matching that saves most of the fixed per-iteration kernel overhead that
    dominates small solves on TPU).

    ``eig_floor > 0`` enables the LOAM degeneracy projection (see
    :func:`degeneracy_projector`), computed from H at the warm-start point
    and held fixed across the solve — mirroring upstream LeGO-LOAM, which
    evaluates ``isDegenerate`` at iterCount == 0 only.  The projector is
    built inside the FIRST loop iteration from that iteration's own
    linearisation (no extra residual/Jacobian evaluation).

    ``prior_weight > 0`` adds a Tikhonov prior anchoring the solve at the
    warm start ``params0``: ``H += wI, g += w (p - params0)`` on the masked
    dims.  For scan-to-scan odometry ``params0`` is the previous frame's
    delta (constant-velocity warm start), so this is a proper MAP prior on
    weak directions: eigenvalues >> w are unaffected, directions with
    information ~< w stay near constant velocity instead of following
    per-frame noise (the velocity-random-walk failure measured in
    benchmarks/seed2_spectrum.py, where the along-track eigenvalue dips to
    ~4-15 while yaw sits at ~1e4).
    """
    use_proj = eig_floor > 0.0
    I6 = jnp.eye(6, dtype=params0.dtype)
    m = dim_mask.astype(params0.dtype)

    def res_with_prior(p):
        r, J, w = residual_fn(p)
        # drop non-finite rows HERE too: the degeneracy projector consumes
        # (r, J, w) directly, and one NaN row would otherwise trip its
        # conservative full-freeze (P = 0) for the entire solve
        row_ok = jnp.isfinite(r) & jnp.all(jnp.isfinite(J), axis=-1)
        r = jnp.where(row_ok, r, 0.0)
        J = jnp.where(row_ok[:, None], J, 0.0)
        w = w * row_ok.astype(w.dtype)
        if prior_weight > 0.0:
            sw = jnp.sqrt(jnp.asarray(prior_weight, p.dtype))
            r_p = sw * (p - params0)
            # rows with |r| <= huber_delta get IRLS weight 1, and the gn_step
            # weight slot is validity: feed the prior rows as 6 residuals of
            # the identity sqrt-information block
            J_p = sw * jnp.eye(6, dtype=p.dtype)
            # keep prior rows outside the Huber reweighting by pre-dividing:
            # huber_weight(r_p) < 1 would soften the prior exactly when it is
            # needed (large deviation) — counteract by scaling weight so
            # w * huber(r) == 1 for prior rows
            hw = huber_weight(r_p, huber_delta)
            w_p = 1.0 / jnp.maximum(hw, 1e-12)
            r = jnp.concatenate([r, r_p])
            J = jnp.concatenate([J, J_p])
            w = jnp.concatenate([w, w_p])
        return r, J, w

    def body(state):
        p, P, _, it = state
        r, J, w = res_with_prior(p)
        if use_proj:
            def make_P(_):
                hw = w * huber_weight(r, huber_delta)
                H0 = J.T @ (J * hw[:, None])
                H0 = H0 * (m[:, None] * m[None, :]) + jnp.diag(1.0 - m)
                return degeneracy_projector(H0, eig_floor)

            P = jax.lax.cond(it == 0, make_P, lambda _: P, None)
        # the 6 prior rows always carry weight > 0: exclude them from the
        # min_count correspondence floor so the degenerate-solve gate keeps
        # its reference semantics (LO.cpp:481,555)
        mc = min_count + (6 if prior_weight > 0.0 else 0)
        p_new = gn_step(p, r, J, w, dim_mask, huber_delta, damping, mc)
        d = P @ (p_new - p)
        # step-norm cap (the bounding role of Ceres's trust region,
        # LO.cpp:483/LM.cpp:612): a raw normal-equation step on a sparse or
        # ambiguous constraint set is unbounded — one measured failure mode
        # was a near-pi yaw jump when a 2-frame-old map met a re-associated
        # scan, flipping the whole trajectory 180 degrees.  Converged steps
        # are <<1; only runaway iterations are touched.
        if max_step > 0.0:
            s = jnp.max(jnp.abs(d))
            d = d * jnp.minimum(1.0, max_step / jnp.maximum(s, 1e-12))
        p_new = p + d
        step = jnp.max(jnp.abs(p_new - p))
        return p_new, P, step, it + 1

    def cond(state):
        _, _, step, it = state
        return (it < iters) & (step > param_tol)

    p, _, _, _ = jax.lax.while_loop(
        cond, body, (params0, I6, jnp.asarray(1.0, params0.dtype),
                     jnp.int32(0)))
    return p


# Measured negative result (2026-08, kept for the record): a full
# Ceres-equivalent LM trust region (diag(H)/radius damping, cost-tested
# accept/reject with Ceres's radius-update policy — the mechanism the
# reference's own sparse-map solves survive on, LM.cpp:612-622) was
# implemented here and A/B'd against the eigen-floor projection on the two
# scenes whose low-constraint first frames pull the floor in opposite
# directions.  The trust region LOST on both (3-seed median ATE 1.15/0.23 m
# vs 0.19/0.11 m for floor=1.0): cost-based acceptance cannot tell a true
# pose correction from OVERFITTING to a sparse first-frame map — steps along
# quasi-degenerate directions reduce the robust cost too, so they are
# accepted, while the eigen floor encodes the correct prior that weak
# directions at low constraint count are noise.  The absolute floor's own
# limits are documented at config.map_eig_floor.

# Dim masks for the reference's two-step scan-to-scan split
SURF_DIMS = jnp.array([0, 0, 1, 0, 0, 0], bool)      # z only (utility.h:224-232)
CORNER_DIMS = jnp.array([1, 1, 0, 0, 0, 1], bool)    # x, y, yaw (utility.h:162-167)
STEP_B_DIMS = jnp.array([1, 1, 1, 0, 0, 1], bool)    # union: joint second solve
FULL_DIMS = jnp.ones(6, bool)                         # scan-to-map 6-DoF
