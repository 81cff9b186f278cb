import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models.pipeline import SlamPipeline
from alego_tpu.models import laser_mapping as lm
from alego_tpu.utils import synthetic, metrics


def test_closed_loop_fires_and_corrects():
    """Full pipeline on a closed loop: loop closure detected and applied
    (BASELINE config 4).

    Scenario notes: a 10 m-radius 60-frame circuit (6 deg/frame) where the
    loop ICP converges on every render seed measured; the earlier 8 m/40-
    frame scene sat at the scan-matching limit and its loop acceptance was
    seed-marginal (fitness straddling the gate) — mechanism tests need a
    robust operating point, the harsh regime is covered by
    test_regression.test_harsh_closed_loop_stays_bounded.
    """
    cfg = tiny_config(icp_iters=30).replace(
        loop_time_gap=3.0,            # synthetic loop is short in sim-time
        history_search_num=10,        # window wide for coverage yet clear of
                                      # the latest keyframes on this short loop
        history_fitness_score=0.5,    # tiny-config scans are 4.4x sparser than
                                      # the real sensor; mean-sq fitness sits
                                      # higher at the same alignment quality
    )
    n = 60
    poses = synthetic.loop_trajectory(n, radius=10.0, closed=True)
    world = synthetic.make_world(seed=103, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=1)

    pipe = SlamPipeline(cfg)
    est = pipe.run(pts, mask)

    ms = pipe.state.mapping
    n_loops = int(ms.graph.loop_count)
    assert n_loops >= 1, "no loop closure fired on a closed trajectory"

    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    assert ate < 1.0, f"loop-closed ATE {ate}"   # measured 0.169


def test_loop_detection_requires_time_gap():
    cfg = tiny_config()
    ms = lm.init_state(cfg)
    # two keyframes close in space but also close in time -> no loop
    import jax.numpy as jnp
    from alego_tpu.models import pose_graph as pg
    g = ms.graph
    g = pg.add_keyframe(g, jnp.eye(4))
    g = pg.add_keyframe(g, jnp.eye(4).at[0, 3].set(2.0))
    ms = ms._replace(graph=g, kf_times=ms.kf_times.at[0].set(0.0).at[1].set(1.0))
    found, closest, latest = lm.detect_loop(ms, cfg)
    assert not bool(found)
    # now age the first keyframe beyond the gap
    ms2 = ms._replace(kf_times=ms.kf_times.at[1].set(100.0))
    found2, closest2, _ = lm.detect_loop(ms2, cfg)
    assert bool(found2) and int(closest2) == 0


def test_coarse_align_rescues_yawed_loop():
    """Coarse BEV alignment (config.loop_coarse_align): when revisit drift
    carries real yaw, the identity-initialised attempt (the reference's
    LM.cpp:828-836 behaviour) falls into a bad optimum and is rejected; the
    bird's-eye correlation rescue must recover the closure."""
    import jax.numpy as jnp
    from tests.test_sharded_mapping import _loop_ready_state
    from alego_tpu.config import tiny_config
    from alego_tpu.ops import se3

    base = dict(max_keyframes=64, loop_time_gap=30.0, history_search_num=3,
                history_fitness_score=0.1, icp_iters=40)
    cfg1 = tiny_config(**base, loop_coarse_align=False)
    cfgK = tiny_config(**base, loop_coarse_align=True)

    ms = _loop_ready_state(cfg1)
    # drift the LATEST keyframe pose by 75 deg yaw: its map-frame cloud now
    # disagrees with the history cloud by a rotation far outside the
    # identity-init ICP basin on this scene (35 deg was still inside)
    latest = int(ms.graph.count) - 1
    import numpy as np
    T = np.asarray(ms.graph.poses[latest])
    Tz = np.eye(4, dtype=np.float32)
    yaw = np.radians(75.0)
    Tz[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    T_drift = (Tz @ T).astype(np.float32)
    ms = ms._replace(graph=ms.graph._replace(
        poses=ms.graph.poses.at[latest].set(jnp.asarray(T_drift))))

    ms1, closed1, fit1 = lm.loop_closure_step(ms, cfg1)
    msK, closedK, fitK = lm.loop_closure_step(ms, cfgK)
    assert float(fitK) < 0.1, f"multi-start did not align (fitness {fitK})"
    assert bool(closedK)
    assert float(fitK) <= float(fit1) + 1e-6
    # the identity-only attempt must NOT have beaten the gate on this scene
    # (otherwise the test isn't exercising the fallback)
    assert not bool(closed1), f"identity ICP unexpectedly aligned ({fit1})"


def test_hoisted_loop_mode_fires_and_corrects():
    """cfg.loop_in_step=False: the loop attempt runs as the host driver's
    own jitted program between dispatches (the reference's separate 1 Hz
    thread, LM.cpp:779) instead of being compiled into the scan — closures
    must still fire and correct on the closed circuit."""
    cfg = tiny_config(icp_iters=30).replace(
        loop_time_gap=3.0, history_search_num=10, history_fitness_score=0.5,
        loop_in_step=False)
    n = 60
    poses = synthetic.loop_trajectory(n, radius=10.0, closed=True)
    world = synthetic.make_world(seed=103, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=1)
    pipe = SlamPipeline(cfg)
    est = pipe.run(pts, mask)
    assert int(pipe.state.mapping.graph.loop_count) >= 1, \
        "hoisted loop mode never closed"
    ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
    assert ate < 1.0, f"hoisted-mode loop-closed ATE {ate}"

    # chunked dispatch path crosses multiple cadence boundaries per call
    pipe2 = SlamPipeline(cfg)
    for c0 in range(0, n, 20):
        pipe2.run_scanned(pts[c0:c0 + 20], mask[c0:c0 + 20])
    assert int(pipe2.state.mapping.graph.loop_count) >= 1
