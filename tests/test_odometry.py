import numpy as np
import jax
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.models import laser_odometry as lo
from alego_tpu.utils import synthetic, metrics


def _frontend(cfg):
    @jax.jit
    def run(pts, mask):
        seg = image_projection(pts, mask, cfg)
        return extract_features(seg, cfg)
    return run


def test_two_frame_motion_recovery():
    """Known planar motion between consecutive frames is recovered."""
    cfg = tiny_config()
    world = synthetic.make_world(seed=11)
    # two poses: forward 0.5 m with 2 deg yaw
    poses = np.stack([np.eye(4), np.eye(4)])
    yaw = np.radians(2.0)
    poses[1][:3, :3] = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    poses[1][:3, 3] = [0.5, 0.1, 0.0]
    pts, mask = synthetic.render_sequence(world, poses, cfg)

    fe = _frontend(cfg)
    step = jax.jit(lambda s, f: lo.odometry_step(s, f, cfg))

    st = lo.init_state(cfg)
    st, _ = step(st, fe(jnp.asarray(pts[0]), jnp.asarray(mask[0])))
    st, pose = step(st, fe(jnp.asarray(pts[1]), jnp.asarray(mask[1])))

    T = np.asarray(pose)
    # world pose of frame 1 relative to frame 0 (frame 0 at identity)
    want = poses[1]
    np.testing.assert_allclose(T[:3, 3], want[:3, 3], atol=0.1)
    got_yaw = np.arctan2(T[1, 0], T[0, 0])
    assert abs(got_yaw - yaw) < np.radians(0.5)


def test_odometry_sequence_ate():
    """Odometry-only on a gentle arc: ATE stays small (BASELINE config 2)."""
    cfg = tiny_config()
    world = synthetic.make_world(seed=12)
    n = 12
    poses = synthetic.loop_trajectory(n, radius=30.0, speed=0.5, closed=False)
    pts, mask = synthetic.render_sequence(world, poses, cfg)

    fe = _frontend(cfg)
    step = jax.jit(lambda s, f: lo.odometry_step(s, f, cfg))

    st = lo.init_state(cfg)
    est = []
    for k in range(n):
        st, pose = step(st, fe(jnp.asarray(pts[k]), jnp.asarray(mask[k])))
        est.append(np.asarray(pose))
    est = np.stack(est)

    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    # ~6 m of travel; odometry drift should stay well under 0.5 m
    assert ate < 0.5, f"ATE {ate}"


def test_first_frame_is_identity():
    cfg = tiny_config()
    world = synthetic.make_world(seed=13)
    pts, mask = synthetic.render_sequence(world, synthetic.loop_trajectory(1), cfg)
    fe = _frontend(cfg)
    st = lo.init_state(cfg)
    st, pose = lo.odometry_step(st, fe(jnp.asarray(pts[0]), jnp.asarray(mask[0])), cfg)
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=1e-6)
    assert bool(st.initialized)
    assert int(np.asarray(st.surf_valid).sum()) > 50
