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
    """Fit n . p = -1 over K neighbours, reference-style (LM.cpp:569-597).

    Returns (unit_n [..., 3], d0 [...], plane_ok [...]): d0 is the plane
    offset after normalisation; plane_ok requires every valid neighbour within
    ``tol`` of the plane.

    Measured negative result (kept for the record): reformulating this fit
    with centred coordinates + Sherman-Morrison removes the (|p|/spread)^2
    conditioning of the raw normal equations and matches an f64 reference fit
    to cos > 0.9998 at |p| ~ 100 m — yet it *degrades* the composed pipeline
    (golden arc ATE 0.09 -> 0.19 m, loop closures stop firing), and so does
    adding a rank-2 scatter gate or replacing the inner GN with
    accept/reject Levenberg-Marquardt.  The small f32 bias of this raw solve
    leaks radial (line-of-sight) components into far-range plane normals,
    which act as range constraints that stabilise feature-poor scenes — the
    same role the reference's noisy real-world planes play for its exact f64
    QR fit (LM.cpp:569-581).  Any future change here must re-validate the
    full golden suite, not just fit accuracy.
    """
    w = valid[..., None].astype(neighbors.dtype)
    A = neighbors * w
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Atb = jnp.einsum("...ki->...i", -A)
    AtA = AtA + 1e-6 * jnp.eye(3, dtype=neighbors.dtype)
    n = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    n_norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1), EPS))
    d0 = 1.0 / n_norm
    unit_n = n / n_norm[..., None]
    dist = jnp.abs(jnp.einsum("...ki,...i->...k", neighbors, unit_n) + d0[..., None])
    plane_ok = jnp.all(jnp.where(valid, dist <= tol, True), -1)
    return unit_n, d0, plane_ok
