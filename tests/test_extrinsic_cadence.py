"""Base-link extrinsic (LO.cpp:591-608) + time-driven loop cadence
(LM.cpp:779-794) — round-4 verdict items 8 and 9."""

import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models import laser_mapping as lm
from alego_tpu.models import laser_odometry as lo
from alego_tpu.models import pipeline as pl
from alego_tpu.models.pipeline import SlamPipeline, SlamState, init_state
from alego_tpu.ops import se3
from alego_tpu.utils import synthetic


def test_tf_b2l_reports_base_link_poses():
    """With a non-trivial laser<->base extrinsic the reported trajectory must
    be the laser trajectory right-multiplied by T_b2l^-1 — exactly the
    reference's tf_o2b = tf_o2l * tf_b2l_.inverse() (LO.cpp:591)."""
    ext = (0.4, -0.1, 0.25, 0.0, 0.0, 0.3)   # lidar 40 cm ahead, yawed 0.3 rad
    cfg_l = tiny_config(loop_closure_enabled=False)
    cfg_b = cfg_l.replace(tf_b2l=ext)

    n = 6
    poses = synthetic.loop_trajectory(n, radius=6.0, closed=False)
    world = synthetic.make_world(seed=11, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg_l, noise=0.01)

    est_l = SlamPipeline(cfg_l).run(pts, mask)
    est_b = SlamPipeline(cfg_b).run(pts, mask)

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(se3.rpy_to_rot(jnp.asarray(ext[3:], jnp.float32)))
    T[:3, 3] = ext[:3]
    expect = est_l @ np.linalg.inv(T)
    assert np.allclose(est_b, expect, atol=1e-4), (
        np.abs(est_b - expect).max())
    # sanity: the trajectories genuinely differ (motion is non-trivial)
    assert np.abs(est_b[-1] - est_l[-1]).max() > 0.05


def test_loop_cadence_is_time_driven_not_keyframe_parity():
    """A stalled ODD keyframe count must not starve loop attempts: the old
    count%N gate never fired when the count sat on the wrong residue while
    keyframes stopped arriving (VERDICT r3 weak #7); the reference's loop
    thread is time-driven at 1 Hz (LM.cpp:785)."""
    from tests.test_sharded_mapping import _loop_ready_state

    cfg = tiny_config(max_keyframes=64, loop_time_gap=30.0,
                      history_search_num=3, history_fitness_score=0.5,
                      icp_iters=25)
    ms = _loop_ready_state(cfg)
    # drop to an ODD count (11): under keyframe parity (every 2nd) this
    # count would gate attempts off forever
    ms = ms._replace(graph=ms.graph._replace(count=jnp.int32(11)))
    assert int(ms.graph.count) % 2 == 1

    st = init_state(cfg)._replace(mapping=ms,
                                  frame=jnp.int32(cfg.loop_every_n_frames))
    pts = np.zeros((cfg.max_raw_points, 3), np.float32)
    msk = np.zeros(cfg.max_raw_points, bool)
    st2, _ = pl.slam_step(st, jnp.asarray(pts), jnp.asarray(msk),
                          jnp.float32(120.0), cfg)
    assert int(st2.mapping.loop_attempts) >= 1, (
        "time-cadence loop attempt did not run with a stalled odd "
        "keyframe count")
    # off-cadence frame: no attempt
    st_off = st._replace(frame=jnp.int32(cfg.loop_every_n_frames + 1))
    st3, _ = pl.slam_step(st_off, jnp.asarray(pts), jnp.asarray(msk),
                          jnp.float32(120.0), cfg)
    assert int(st3.mapping.loop_attempts) == 0
