"""SO(3)/SE(3) utilities (jit-friendly, batched).

Conventions match the reference: every rotation is composed as
``Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (Eigen ``AngleAxis`` products, e.g.
``/root/reference/include/alego/utility.h:128`` and ``LM.cpp:628``), and pose
state is carried either as ``(t[3], rpy[3])`` 6-vectors (the Ceres parameter
block layout ``params_[0:3]=t, params_[3:6]=rpy``, LO.cpp:64) or as 4x4
homogeneous matrices.  The pose-graph solver additionally uses the se(3)
exponential map with twists ordered ``[rho(3), phi(3)]``.

All functions work on arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Euler (roll, pitch, yaw) <-> rotation matrix, ZYX composition
# ---------------------------------------------------------------------------

def rpy_to_rot(rpy: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(yaw) Ry(pitch) Rx(roll); rpy[..., 0:3] = roll, pitch, yaw."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    sr, cr = jnp.sin(r), jnp.cos(r)
    sp, cp = jnp.sin(p), jnp.cos(p)
    sy, cy = jnp.sin(y), jnp.cos(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def rot_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rpy_to_rot` (ZYX decomposition, gimbal-safe clamp)."""
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], -1)


def yaw_to_rot(yaw: jnp.ndarray) -> jnp.ndarray:
    """Pure z-axis rotation; odometry integrates yaw only (LO.cpp:581)."""
    zeros = jnp.zeros_like(yaw)
    return rpy_to_rot(jnp.stack([zeros, zeros, yaw], -1))


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z], branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)
    cands = jnp.stack([q0, q1, q2, q3], -2)
    scores = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(scores, -1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


# ---------------------------------------------------------------------------
# 6-vector pose params [tx ty tz roll pitch yaw]  (Ceres block layout)
# ---------------------------------------------------------------------------

def params_to_mat(params: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 4, 4] homogeneous transform."""
    R = rpy_to_rot(params[..., 3:6])
    T = jnp.zeros(params.shape[:-1] + (4, 4), params.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(params[..., :3])
    T = T.at[..., 3, 3].set(1.0)
    return T


def mat_to_params(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([T[..., :3, 3], rot_to_rpy(T[..., :3, :3])], -1)


def transform_points(params: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose params [..., 6] to points [..., N, 3]: R p + t."""
    R = rpy_to_rot(params[..., 3:6])
    return pts @ jnp.swapaxes(R, -1, -2) + params[..., None, :3]


def compose_mats(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def inv_mat(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


# ---------------------------------------------------------------------------
# se(3) exponential / logarithm, twist = [rho(3), phi(3)]
# ---------------------------------------------------------------------------

def hat(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    axis = phi / theta
    th = theta[..., None]
    K = hat(axis)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    # 1 - cos t = 2 sin^2(t/2): stable in f32 for small t
    one_minus_cos = 2.0 * jnp.sin(th / 2) ** 2
    R = I + jnp.sin(th) * K + one_minus_cos * (K @ K)
    small = (theta[..., None] < 1e-6)
    R_small = I + hat(phi)
    return jnp.where(small, R_small, R)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    cos_theta = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    sin_theta = jnp.sin(theta)
    scale = jnp.where(theta[..., None] < 1e-6, 0.5,
                      theta[..., None] / jnp.maximum(2 * sin_theta[..., None], 1e-12))
    return scale * w


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(phi, axis=-1)
    th = jnp.maximum(theta, 1e-9)[..., None, None]
    K = hat(phi / jnp.maximum(theta, 1e-9)[..., None])
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    one_minus_cos = 2.0 * jnp.sin(th / 2) ** 2          # stable 1 - cos
    J = I + (one_minus_cos / th) * K + ((th - jnp.sin(th)) / th) * (K @ K)
    # f32: (th - sin th) cancels catastrophically below ~1e-3
    small = theta[..., None, None] < 1e-3
    return jnp.where(small, I + 0.5 * hat(phi), J)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] twist [rho, phi] -> [..., 4, 4]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] twist [rho, phi]."""
    phi = so3_log(T[..., :3, :3])
    # V^-1 via closed form, with f32-stable trig: 1-cos = 2 sin^2(t/2).
    theta = jnp.linalg.norm(phi, axis=-1)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    th = jnp.maximum(theta, 1e-9)[..., None, None]
    A = jnp.sin(th) / th
    B = 2.0 * jnp.sin(th / 2) ** 2 / (th * th)
    coef = (1 - A / (2 * jnp.maximum(B, 1e-12))) / (th * th)
    # series limit: coef -> 1/12 as theta -> 0; A/(2B) loses precision below
    # ~1e-2 in f32, so switch early (K is O(theta), error O(theta^2/12))
    coef = jnp.where(th < 1e-2, 1.0 / 12.0, coef)
    Vinv = I - 0.5 * K + coef * (K @ K)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([rho, phi], -1)


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6, 6] adjoint for twist order [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Ad = jnp.zeros(T.shape[:-2] + (6, 6), T.dtype)
    Ad = Ad.at[..., :3, :3].set(R)
    Ad = Ad.at[..., :3, 3:].set(hat(t) @ R)
    Ad = Ad.at[..., 3:, 3:].set(R)
    return Ad


# ---------------------------------------------------------------------------
# Closed-form derivatives of R(rpy) @ p w.r.t. roll/pitch/yaw.
# ---------------------------------------------------------------------------

def drotp_drpy(rpy: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """d(R(rpy) p)/d(rpy): returns [..., 3(xyz), 3(d/droll,d/dpitch,d/dyaw)].

    Matches the analytic expressions in the reference cost functions
    (utility.h:148-158 and duplicates), which are the exact partials of
    Rz(y)Ry(p)Rx(r) p.
    """
    r, pt, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    sr, cr = jnp.sin(r), jnp.cos(r)
    sp, cp = jnp.sin(pt), jnp.cos(pt)
    sy, cy = jnp.sin(y), jnp.cos(y)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]

    dx_dr = (cy * sp * cr + sr * sy) * py + (sy * cr - cy * sr * sp) * pz
    dy_dr = (-cy * sr + sy * sp * cr) * py + (-sr * sy * sp - cy * cr) * pz
    dz_dr = cp * cr * py - cp * sr * pz

    dx_dp = -cy * sp * px + cy * cp * sr * py + cy * cr * cp * pz
    # NB: the reference's dy_dp z-term reads ``cr*sr*cp*pz`` (utility.h:217 and
    # three duplicates) — the true partial of Rz Ry Rx is ``sy*cp*cr*pz``
    # (verified against autodiff). We implement the correct derivative.
    dy_dp = -sp * sy * px + sy * cp * sr * py + sy * cp * cr * pz
    dz_dp = -cp * px - sp * sr * py - sp * cr * pz

    dx_dy = -sy * cp * px - (sy * sp * sr + cr * cy) * py + (cy * sr - sy * cr * sp) * pz
    dy_dy = cp * cy * px + (-sy * cr + cy * sp * sr) * py + (cy * cr * sp + sy * sr) * pz
    dz_dy = jnp.zeros_like(dx_dy)

    col_r = jnp.stack([dx_dr, dy_dr, dz_dr], -1)
    col_p = jnp.stack([dx_dp, dy_dp, dz_dp], -1)
    col_y = jnp.stack([dx_dy, dy_dy, dz_dy], -1)
    return jnp.stack([col_r, col_p, col_y], -1)
