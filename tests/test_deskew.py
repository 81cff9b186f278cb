import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.ops import deskew
from alego_tpu.ops.se3 import rpy_to_rot


def test_imu_integration_constant_velocity():
    buf = deskew.init_buffer(64)
    # stationary attitude, constant forward acceleration 1 m/s^2, level
    for k in range(10):
        t = k * 0.1
        buf = deskew.integrate_imu(
            buf, jnp.float32(t), jnp.zeros(3, jnp.float32),
            jnp.asarray([1.0, 0.0, deskew.GRAVITY], jnp.float32))
    v = np.asarray(buf.velo)[9]
    s = np.asarray(buf.shift)[9]
    np.testing.assert_allclose(v, [0.9, 0, 0], atol=1e-5)
    # s = 0.5 a t^2 (discrete sum slightly below continuous)
    assert 0.3 < s[0] < 0.45
    np.testing.assert_allclose(v[1:], 0, atol=1e-5)


def test_deskew_removes_scan_rotation():
    """Points acquired while the sensor yaws are rotated back to sweep start."""
    cfg = tiny_config()
    buf = deskew.init_buffer(64)
    yaw_rate = 0.5  # rad/s
    for k in range(12):
        t = k * 0.05
        buf = deskew.integrate_imu(
            buf, jnp.float32(t),
            jnp.asarray([0.0, 0.0, yaw_rate * t], jnp.float32),
            jnp.asarray([0.0, 0.0, deskew.GRAVITY], jnp.float32))

    # a wall point seen at column c was observed in a frame yawed by
    # yaw_rate * rel_t; true world point = Rz(yaw) p_measured
    n = 50
    rng = np.random.default_rng(0)
    world_pts = rng.uniform(2, 10, (n, 3)).astype(np.float32)
    cols = np.linspace(0, cfg.horizon_scan - 1, n).astype(np.int32)
    rel_t = cols / cfg.horizon_scan * cfg.scan_period
    scan_time = 0.2
    yaws = yaw_rate * (scan_time + rel_t) - yaw_rate * scan_time
    measured = np.stack([
        np.asarray(rpy_to_rot(jnp.asarray([0, 0, yaw_rate * (scan_time + rel_t[i])],
                                          jnp.float32))).T @ world_pts[i]
        for i in range(n)])
    # de-skew should map measured points into the sweep-start frame:
    # R_start^T world = measured at rel_t=0
    want = np.stack([
        np.asarray(rpy_to_rot(jnp.asarray([0, 0, yaw_rate * scan_time],
                                          jnp.float32))).T @ world_pts[i]
        for i in range(n)])

    out = deskew.deskew(jnp.asarray(measured), jnp.asarray(cols),
                        jnp.ones(n, bool), jnp.float32(scan_time), buf, cfg)
    out = np.asarray(out)
    err_before = np.abs(measured - want).max()
    err_after = np.abs(out - want).max()
    assert err_after < 0.2 * err_before, (err_before, err_after)


def test_deskew_noop_without_imu():
    cfg = tiny_config()
    buf = deskew.init_buffer(16)
    pts = np.random.default_rng(1).uniform(-5, 5, (10, 3)).astype(np.float32)
    out = deskew.deskew(jnp.asarray(pts), jnp.zeros(10, jnp.int32),
                        jnp.ones(10, bool), jnp.float32(0.0), buf, cfg)
    np.testing.assert_allclose(np.asarray(out), pts)


def test_orientation_rel_time_no_full_sweep_wrap():
    """A start-column point whose bin centre sits just BEFORE orient_start
    must get rel_t ~ 0 (slightly-negative time clipped, LO.cpp:680-700),
    not alias to a full sweep period through the mod wrap."""
    cfg = tiny_config()
    buf = deskew.init_buffer(64)
    for k in range(12):                     # any valid buffer (>= 2 samples)
        t = k * 0.05
        buf = deskew.integrate_imu(
            buf, jnp.float32(t),
            jnp.asarray([0.0, 0.0, 0.8 * t], jnp.float32),
            jnp.asarray([0.0, 0.0, deskew.GRAVITY], jnp.float32))

    # sweep starts mid-column: orient_start just AFTER column 0's centre
    col0_center = 0.5 * cfg.ang_res_x
    orient_start = jnp.float32(col0_center + 0.01)
    orient_diff = jnp.float32(2 * np.pi)

    pts = jnp.asarray(np.tile([[5.0, 0.0, 0.0]], (2, 1)), jnp.float32)
    cols = jnp.asarray([0, 1], jnp.int32)   # col 0: centre BEFORE start
    out = deskew.deskew(pts, cols, jnp.ones(2, bool), jnp.float32(0.3),
                        buf, cfg, orient_start=orient_start,
                        orient_diff=orient_diff)
    # both neighbouring columns must de-skew nearly identically (both are
    # start-of-sweep); the old wrap gave col 0 an end-of-sweep pose
    delta = float(jnp.abs(out[0] - out[1]).max())
    assert delta < 0.05, delta
