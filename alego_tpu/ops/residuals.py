"""Batched LiDAR residuals + analytic Jacobians (C4-C7 equivalents).

The reference evaluates four scalar ``ceres::SizedCostFunction<1,6>`` classes
one correspondence at a time (``/root/reference/include/alego/utility.h:
122-349``).  Here each family is a single batched function producing
``(r [N], J [N, 6])`` for the whole correspondence set at once; the Gauss-
Newton solver consumes them with masks.  Parameter layout matches the Ceres
block: ``[tx, ty, tz, roll, pitch, yaw]``; the transformed point is
``lp = Rz(yaw) Ry(pitch) Rx(roll) cp + t``.

Deviations from the reference (both documented, both *corrections*):
* the pitch-column term of d(Rp)/drpy fixes the reference's algebra slip
  (see ops/se3.drotp_drpy);
* the scan-to-scan surf residual (utility.h:188-197) squares the plane-normal
  components too early, yielding ``|d ⊙ n| / |n|`` instead of the
  point-to-plane distance ``|d . n| / |n|``; we implement the true
  point-to-plane form.  For the near-horizontal ground planes this residual is
  applied to, the two agree to first order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .se3 import rpy_to_rot, drotp_drpy

EPS = 1e-9


def _transform(params: jnp.ndarray, cp: jnp.ndarray):
    """lp = R cp + t and d(lp)/d(params) [N, 3, 6]."""
    R = rpy_to_rot(params[3:6])
    lp = cp @ R.T + params[:3]
    J_rot = drotp_drpy(params[3:6], cp)           # [N, 3, 3]
    J_t = jnp.broadcast_to(jnp.eye(3, dtype=cp.dtype), J_rot.shape)
    return lp, jnp.concatenate([J_t, J_rot], axis=-1)  # [N, 3, 6]


def point_to_line(params: jnp.ndarray, cp: jnp.ndarray, pj: jnp.ndarray,
                  pl: jnp.ndarray):
    """Point-to-line residual |(lp-pj) x (lp-pl)| / |pj-pl| and its Jacobian.

    Matches CornerCostFunction / LidarEdgeCostFunction (utility.h:126-174,
    246-294); the caller masks Jacobian columns (odometry corners use only
    x, y, yaw — utility.h:162-167).
    """
    lp, dlp = _transform(params, cp)
    u = lp - pj
    v = lp - pl
    w = pj - pl
    k = jnp.sqrt(jnp.sum(w * w, -1) + EPS)
    c = jnp.cross(u, v)
    m = jnp.sqrt(jnp.sum(c * c, -1) + EPS)
    r = m / k

    # Perturbing lp by delta changes c by delta x (v - u) = delta x w, so
    # dm/dlp = (w x c) / m — identical to the reference's expanded form
    # (utility.h:137-139).
    dm_dlp = jnp.cross(w, c) / m[..., None]
    J = jnp.einsum("ni,nij->nj", dm_dlp, dlp) / k[..., None]
    return r, J


def point_to_plane_3pt(params: jnp.ndarray, cp: jnp.ndarray, pj: jnp.ndarray,
                       pl: jnp.ndarray, pm: jnp.ndarray):
    """Scan-to-scan surf residual from 3 plane points (SurfCostFunction,
    utility.h:184-235) — true point-to-plane distance |n.(lp-pj)|/|n|."""
    lp, dlp = _transform(params, cp)
    n = jnp.cross(pj - pl, pj - pm)
    n_norm = jnp.sqrt(jnp.sum(n * n, -1) + EPS)
    d = lp - pj
    signed = jnp.sum(d * n, -1) / n_norm
    r = jnp.abs(signed)
    sign = jnp.sign(signed)
    dr_dlp = sign[..., None] * n / n_norm[..., None]
    J = jnp.einsum("ni,nij->nj", dr_dlp, dlp)
    return r, J


def point_to_plane_fitted(params: jnp.ndarray, cp: jnp.ndarray,
                          unit_n: jnp.ndarray, d0: jnp.ndarray):
    """Scan-to-map plane residual n.lp + d against a fitted unit-normal plane
    (LidarPlaneCostFunction, utility.h:304-343). Signed residual."""
    lp, dlp = _transform(params, cp)
    r = jnp.sum(unit_n * lp, -1) + d0
    J = jnp.einsum("ni,nij->nj", unit_n, dlp)
    return r, J


class Correspondences(NamedTuple):
    """A batch of residual specs for one GN solve.

    kind 0 = line (pj, pl used), kind 1 = plane-3pt (pj, pl, pm),
    kind 2 = fitted plane (pj=unit normal, scalar=d0).
    """

    cp: jnp.ndarray       # [N, 3] current-frame point
    pj: jnp.ndarray       # [N, 3]
    pl: jnp.ndarray       # [N, 3]
    pm: jnp.ndarray       # [N, 3]
    scalar: jnp.ndarray   # [N]
    kind: jnp.ndarray     # [N] int32
    weight: jnp.ndarray   # [N] float (0 = padding)


def eval_correspondences(params: jnp.ndarray, corr: Correspondences):
    """Evaluate all residual families branch-free and select by kind."""
    r0, J0 = point_to_line(params, corr.cp, corr.pj, corr.pl)
    r1, J1 = point_to_plane_3pt(params, corr.cp, corr.pj, corr.pl, corr.pm)
    r2, J2 = point_to_plane_fitted(params, corr.cp, corr.pj, corr.scalar)
    k = corr.kind[:, None]
    r = jnp.where(corr.kind == 0, r0, jnp.where(corr.kind == 1, r1, r2))
    J = jnp.where(k == 0, J0, jnp.where(k == 1, J1, J2))
    return r, J
