import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models.pipeline import SlamPipeline
from alego_tpu.utils import synthetic, metrics
from alego_tpu.utils.profiling import TicToc, StageTimer


def test_pipeline_with_imu_enabled():
    """use_imu=True compiles and runs; with a stationary IMU the de-skew is
    a near-no-op and accuracy matches the default path."""
    cfg = tiny_config().replace(use_imu=True, loop_closure_enabled=False)
    world = synthetic.make_world(seed=61)
    n = 8
    poses = synthetic.loop_trajectory(n, radius=25.0, speed=0.5, closed=False)
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)

    pipe = SlamPipeline(cfg)
    for k in range(n):
        # quiet IMU stream: attitude flat, gravity-only specific force
        for s in range(4):
            pipe.add_imu(k * cfg.scan_period + s * 0.05,
                         [0.0, 0.0, 0.0], [0.0, 0.0, 9.81])
        pipe.process(pts[k], mask[k])
    est = np.stack(pipe.poses)
    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    assert ate < 0.5, ate
    assert int(pipe.state.imu.count) == 4 * n


def test_profiling_utils():
    t = TicToc()
    assert t.toc() >= 0.0
    st = StageTimer()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    rep = st.report()
    assert "a:" in rep and "x 2" in rep


def test_lslidar_c16_sensor_path():
    """The uniform-row LSLIDAR_C16 table (IP.cpp:140) runs E2E."""
    from alego_tpu.config import LaserType

    cfg = tiny_config().replace(laser_type=LaserType.LSLIDAR_C16,
                                loop_closure_enabled=False)
    poses = synthetic.loop_trajectory(8, radius=28.0, speed=0.6, closed=False)
    world = synthetic.make_world(seed=51, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)
    pipe = SlamPipeline(cfg)
    est = pipe.run_scanned(pts, mask)
    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    assert ate < 0.8, ate


def test_pipeline_with_odom_enabled():
    """use_odom=True: external odometry samples drive the same de-skew path
    (LO.cpp:737-795); a quiet odom stream is a near-no-op."""
    cfg = tiny_config().replace(use_odom=True, loop_closure_enabled=False)
    poses = synthetic.loop_trajectory(8, radius=25.0, speed=0.5, closed=False)
    world = synthetic.make_world(seed=61, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)

    pipe = SlamPipeline(cfg)
    for k in range(8):
        for s in range(4):
            t = k * cfg.scan_period + s * 0.05
            pipe.add_odom(t, [0.0, 0.0, 0.0], [0.5 * t, 0.0, 0.0],
                          [0.5, 0.0, 0.0])
        pipe.process(pts[k], mask[k])
    est = np.stack(pipe.poses)
    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    assert ate < 0.5, ate
    assert int(pipe.state.imu.count) == 32
