import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from alego_tpu.ops import se3


def rand_rpy(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)


def test_rpy_to_rot_matches_scipy():
    rpy = rand_rpy(32)
    R = np.asarray(se3.rpy_to_rot(jnp.asarray(rpy)))
    # Eigen: Rz(yaw) Ry(pitch) Rx(roll) == scipy extrinsic 'xyz' with angles r,p,y
    R_ref = Rotation.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot_rpy_roundtrip():
    rpy = rand_rpy(64, 1)
    back = np.asarray(se3.rot_to_rpy(se3.rpy_to_rot(jnp.asarray(rpy))))
    np.testing.assert_allclose(back, rpy, atol=1e-5)


def test_quat_roundtrip():
    rpy = rand_rpy(64, 2)
    R = se3.rpy_to_rot(jnp.asarray(rpy))
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = rng.uniform(-0.8, 0.8, (40, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-3)


def test_se3_exp_tiny_angle():
    xi = jnp.array([[1e-9, 0, 0, 0, 0, 1e-9]], jnp.float32)
    T = np.asarray(se3.se3_exp(xi))
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-6)


def test_params_mat_roundtrip():
    rng = np.random.default_rng(4)
    p = rng.uniform(-1, 1, (16, 6)).astype(np.float32)
    T = se3.params_to_mat(jnp.asarray(p))
    back = np.asarray(se3.mat_to_params(T))
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_inv_mat():
    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.uniform(-1, 1, (8, 6)).astype(np.float32))
    T = se3.params_to_mat(p)
    I = np.asarray(T @ se3.inv_mat(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_drotp_drpy_matches_autodiff():
    import jax

    rng = np.random.default_rng(6)
    rpy = jnp.asarray(rng.uniform(-1, 1, (3,)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-5, 5, (3,)).astype(np.float32))

    f = lambda a: se3.rpy_to_rot(a) @ p
    J_auto = jax.jacfwd(f)(rpy)
    J_closed = se3.drotp_drpy(rpy, p)
    np.testing.assert_allclose(np.asarray(J_closed), np.asarray(J_auto), atol=2e-3)


def test_adjoint_identity():
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.uniform(-0.5, 0.5, (6,)).astype(np.float32))
    eps = jnp.asarray(rng.uniform(-1e-3, 1e-3, (6,)).astype(np.float32))
    T = se3.se3_exp(xi)
    # T Exp(eps) T^-1 == Exp(Ad_T eps)
    lhs = se3.se3_log(T @ se3.se3_exp(eps) @ se3.inv_mat(T))
    rhs = se3.adjoint(T) @ eps
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
