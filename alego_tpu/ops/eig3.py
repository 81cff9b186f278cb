"""Closed-form batched 3x3 symmetric eigen-analysis + small plane fits (T6).

Replaces ``Eigen::SelfAdjointEigenSolver<Matrix3d>`` (line-direction PCA,
``/root/reference/src/LM.cpp:542-548``) and the 5x3 ``colPivHouseholderQr``
plane fit (LM.cpp:569-581) with vectorised closed forms: the trigonometric
eigenvalue formula for symmetric 3x3 matrices, eigenvectors via the
Cayley-Hamilton product trick, and the plane fit via 3x3 normal equations.
Everything maps over the batch dimension — thousands of fits per mapping
iteration in one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def det_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of batched [..., 3, 3].

    ``jnp.linalg.det`` lowers to a batched LU on TPU — a serial slow path at
    mapping batch sizes; this cofactor expansion is pure elementwise VPU work
    and fuses with its consumers.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def solve_spd_3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form Cholesky solve of batched SPD A [..., 3, 3] x = b [..., 3].

    ``jnp.linalg.solve`` lowers to a serial batched LU custom call on TPU —
    measured 2.75 ms for a [3072, 3, 3] batch on v5e vs 0.05 ms for this
    unrolled Cholesky (pure elementwise VPU work, fuses with its consumers).
    Cholesky without pivoting is backward-stable for SPD inputs; callers add
    a ridge and gate results (plane_ok), as the reference discards bad QR
    fits (LM.cpp:582-597).

    Pivot clamps are RELATIVE to the running diagonal scale: with an
    absolute 1e-30 clamp, f32 cancellation on ill-conditioned inputs
    (cond >> 2^24 — e.g. plane fits on 5 near-collinear map points at
    ~100 m coordinates) produced ~1e-15 pivots whose back-substitution
    overflowed to Inf - Inf = NaN.  A clamped-relative pivot keeps every
    intermediate bounded; the (gated) solution on such inputs is a damped
    minimum-norm-style answer, as the reference's pivoted QR would give.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    tiny = jnp.asarray(1e-30, A.dtype)
    rel = jnp.asarray(1e-7, A.dtype) * (a00 + a11 + a22)
    l00 = jnp.sqrt(jnp.maximum(a00, rel + tiny))
    l10 = a01 / l00
    l20 = a02 / l00
    l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, rel + tiny))
    l21 = (a12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, rel + tiny))
    y0 = b[..., 0] / l00
    y1 = (b[..., 1] - l10 * y0) / l11
    y2 = (b[..., 2] - l20 * y0 - l21 * y1) / l22
    x2 = y2 / l22
    x1 = (y1 - l21 * x2) / l11
    x0 = (y0 - l10 * x1 - l20 * x2) / l00
    return jnp.stack([x0, x1, x2], -1)


def sym_eigvals_3x3(C: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], ascending [l0 <= l1 <= l2]."""
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=C.dtype)
    B = C - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, EPS))
    detB = det_3x3(B)
    r = detB / jnp.maximum(2 * p ** 3, EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l2 = q + 2 * p * jnp.cos(phi)
    l0 = q + 2 * p * jnp.cos(phi + 2 * jnp.pi / 3)
    l1 = 3 * q - l0 - l2
    return jnp.stack([l0, l1, l2], -1)


def principal_direction(C: jnp.ndarray, eigvals: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the largest eigenvalue of symmetric [..., 3, 3].

    By Cayley-Hamilton, (C - l0 I)(C - l1 I) has columns proportional to the
    l2-eigenvector; pick the best-conditioned column.
    """
    I = jnp.eye(3, dtype=C.dtype)
    A = (C - eigvals[..., 0, None, None] * I) @ (C - eigvals[..., 1, None, None] * I)
    norms = jnp.sum(A * A, axis=-2)          # column squared norms [..., 3]
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(A, best[..., None, None].repeat(3, -2), -1)[..., 0]
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), EPS))


def rotation_from_covariance(S: jnp.ndarray) -> jnp.ndarray:
    """Kabsch rotation from a 3x3 cross-covariance: the R maximising
    ``tr(R S)`` over SO(3) — closed form, no SVD.

    ``jnp.linalg.svd`` on a single 3x3 costs ~0.09 ms per call on TPU v5e
    (serial LAPACK-style custom call); inside the 100-iteration loop-closure
    ICP that is ~9 ms per loop attempt — the dominant loop-closure cost.
    This closed form is pure elementwise work.

    Derivation: with S = U diag(s) V^T, Kabsch gives R = V D U^T,
    D = diag(1, 1, sign(det S)) applied to the smallest singular value.
    V = eigvecs(S^T S) and U's columns are S v_i / s_i, so build both bases
    right-handed (third column by cross product) and the reflection case
    resolves automatically: R = sum_i v_i u_i^T.  Rank-1/rank-0 S (collinear
    correspondence sets) yields a valid rotation built from the dominant
    direction; callers iterate (ICP) and gate on fitness.
    """
    def _unit_or(v, fallback, thresh=1e-12):
        """Normalise v; where |v| is negligible use ``fallback`` (already
        unit). Degenerate eigenspaces/rank-deficient S make some directions
        unobservable — any completion is optimal, it just must stay
        orthonormal."""
        n2 = jnp.sum(v * v, -1, keepdims=True)
        safe = v / jnp.sqrt(jnp.maximum(n2, EPS))
        return jnp.where(n2 > thresh, safe, fallback)

    def _perp(v):
        """A deterministic unit vector orthogonal to unit v."""
        e = jnp.where(jnp.abs(v[..., :1]) < 0.9,
                      jnp.broadcast_to(jnp.eye(3, dtype=v.dtype)[0], v.shape),
                      jnp.broadcast_to(jnp.eye(3, dtype=v.dtype)[1], v.shape))
        w = jnp.cross(v, e)
        return w / jnp.sqrt(jnp.maximum(jnp.sum(w * w, -1, keepdims=True), EPS))

    # scale-normalise first: the Kabsch rotation is invariant to S -> cS and
    # real ICP covariances reach ||S|| ~ 1e6 (weight-sum x metre^2 scale),
    # where the squared column norms of the Cayley-Hamilton products hit
    # ~1e44 and OVERFLOW f32 — normalising bounds every intermediate O(1)
    # clamp at the f32 floor only (1e-12 here would mis-normalise small
    # covariances, e.g. |S| ~ 1e-8, and push the products into the
    # degeneracy fallbacks)
    fro = jnp.sqrt(jnp.maximum(jnp.sum(S * S, axis=(-2, -1), keepdims=True),
                               1e-35))
    Sn = S / fro

    M = jnp.swapaxes(Sn, -1, -2) @ Sn
    ev = sym_eigvals_3x3(M)                     # ascending [l0, l1, l2], <= 1
    e0 = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype)[0], S.shape[:-2] + (3,))

    def _best_col(A):
        norms = jnp.sum(A * A, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        return jnp.take_along_axis(
            A, best[..., None, None].repeat(3, -2), -1)[..., 0]

    # v2 via Cayley-Hamilton; when l2 ~ l1 the product vanishes — fall back
    # to the top EIGENPLANE (best column of M - l0 I), then to e0 (full
    # isotropy, where any orthonormal V is optimal).  The middle eigenvector
    # is never extracted directly (its signal (l1-l0)(l2-l1) is the weakest
    # by construction): v0's signal (l1-l0)(l2-l0) is strong exactly when
    # the top plane is degenerate, so compute v0 and take v1 = v2 x v0.
    I = jnp.eye(3, dtype=S.dtype)
    M0 = M - ev[..., 0, None, None] * I
    plane = _unit_or(_best_col(M0), e0, thresh=1e-12)
    A2 = M0 @ (M - ev[..., 1, None, None] * I)
    v2 = _unit_or(_best_col(A2), plane, thresh=1e-12)

    A0 = ((M - ev[..., 1, None, None] * I)
          @ (M - ev[..., 2, None, None] * I))
    v0raw = _best_col(A0)
    v0raw = v0raw - jnp.sum(v0raw * v2, -1, keepdims=True) * v2
    # weak v0 signal => l1 ~ l0: the bottom subspace is degenerate and any
    # direction orthogonal to v2 is a valid eigvector
    v0 = _unit_or(v0raw, _perp(v2), thresh=1e-12)
    v1 = jnp.cross(v2, v0)                      # right-handed [v0, v1, v2]

    # u-basis fallbacks must PAIR with the v-basis (u_i -> v_i), not with an
    # arbitrary frame: unpaired fallbacks made R(S ~ 0) a fixed 90-degree
    # rotation, so an ICP attempt with zero in-range correspondences (w = 0,
    # S = 0 — e.g. a bad loop candidate beyond max_corr_dist) spun the
    # transform every iteration instead of returning identity
    u2 = _unit_or((Sn @ v2[..., None])[..., 0], v2, thresh=1e-12)
    u1raw = (Sn @ v1[..., None])[..., 0]
    u1raw = u1raw - jnp.sum(u1raw * u2, -1, keepdims=True) * u2
    v1p = v1 - jnp.sum(v1 * u2, -1, keepdims=True) * u2
    u1 = _unit_or(u1raw, _unit_or(v1p, _perp(u2), thresh=1e-12),
                  thresh=1e-12)
    u0 = jnp.cross(u1, u2)

    return (v2[..., :, None] * u2[..., None, :]
            + v1[..., :, None] * u1[..., None, :]
            + v0[..., :, None] * u0[..., None, :])


def pca_line_fit(neighbors: jnp.ndarray, valid: jnp.ndarray):
    """Line test on K-NN sets (LM.cpp:523-552).

    neighbors [..., K, 3], valid [..., K]. Returns (center [..., 3],
    direction [..., 3], is_line [...]) with the reference's criterion
    l2 > 3 * l1 applied by the caller via the returned eigenvalues.
    """
    w = valid[..., None].astype(neighbors.dtype)
    cnt = jnp.maximum(jnp.sum(w, -2), 1.0)
    center = jnp.sum(neighbors * w, -2) / cnt
    d = (neighbors - center[..., None, :]) * w
    C = jnp.einsum("...ki,...kj->...ij", d, d)
    ev = sym_eigvals_3x3(C)
    direction = principal_direction(C, ev)
    return center, direction, ev


def plane_fit(neighbors: jnp.ndarray, valid: jnp.ndarray, tol: float):
    """Fit the neighbour plane; returns (unit_n [..., 3], d0 [...],
    plane_ok [...]) with the residual convention ``unit_n . p + d0``;
    plane_ok requires every valid neighbour within ``tol`` of the plane
    (LM.cpp:582-597).

    DOCUMENTED DEVIATION from the reference's raw ``n . p = -1`` LS system
    (LM.cpp:569-581): that system's conditioning scales with the squared
    DISTANCE of the points from the origin, not their spread — at the
    sensor-realistic 50-120 m coordinates of the bench circuit cond(AtA)
    is ~1e7 even for a PERFECT plane and >>2^24 for degenerate neighbour
    sets, beyond f32 entirely (measured: the f32 Cholesky NaN'd on
    degenerate far sets, and the non-finite-H guard then froze whole
    scan-to-map solves — the round-2 seed-2 divergence window,
    benchmarks/map_spectrum.py; a scale-relative ridge fixed the NaNs but
    biased healthy far fits by >0.5 m).  The reference survives only
    because Eigen's pivoted QR runs in f64.  TPU-native f32 needs the
    CENTERED total-least-squares fit: the normal is the smallest
    eigenvector of the centred covariance (conditioned on point SPREAD,
    scale-invariant), d0 = -n . centroid.  For the coplanar sets the 0.2 m
    gate accepts, the two formulations agree to first order in the
    residuals.
    """
    w = valid[..., None].astype(neighbors.dtype)
    cnt = jnp.maximum(jnp.sum(w, -2), 1.0)
    center = jnp.sum(neighbors * w, -2) / cnt
    q = (neighbors - center[..., None, :]) * w
    C = jnp.einsum("...ki,...kj->...ij", q, q)
    ev = sym_eigvals_3x3(C)                      # ascending l0 <= l1 <= l2
    I = jnp.eye(3, dtype=neighbors.dtype)
    # Cayley-Hamilton: columns of (C - l1)(C - l2) span the l0 eigenvector;
    # signal strength (l1 - l0)(l2 - l0) is strong exactly when the set is
    # planar (l0 << l1).  Collinear/degenerate sets fall back to a fixed
    # axis — finite output, and their plane passes the tol gate just as the
    # reference's arbitrary rank-deficient QR solution would.
    A0 = (C - ev[..., 1, None, None] * I) @ (C - ev[..., 2, None, None] * I)
    norms = jnp.sum(A0 * A0, axis=-2)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(A0, best[..., None, None].repeat(3, -2), -1)[..., 0]
    n2 = jnp.sum(v * v, -1, keepdims=True)
    ez = jnp.broadcast_to(jnp.eye(3, dtype=neighbors.dtype)[2],
                          v.shape)
    unit_n = jnp.where(n2 > 1e-20, v / jnp.sqrt(jnp.maximum(n2, EPS)), ez)
    d0 = -jnp.sum(unit_n * center, -1)
    dist = jnp.abs(jnp.einsum("...ki,...i->...k", neighbors, unit_n) + d0[..., None])
    plane_ok = jnp.all(jnp.where(valid, dist <= tol, True), -1)
    return unit_n, d0, plane_ok
