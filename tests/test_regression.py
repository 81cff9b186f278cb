"""Golden-trajectory regression: fixed-seed synthetic sequences must keep
meeting their accuracy envelopes. Catches silent accuracy regressions that
unit tests miss (SURVEY §4: the test strategy the reference lacked)."""

import numpy as np

from alego_tpu.config import tiny_config
from alego_tpu.models.pipeline import SlamPipeline
from alego_tpu.utils import synthetic, metrics

# (seed, n_frames, speed, radius, closed, max_ate_m)
CASES = [
    (101, 24, 0.5, 30.0, False, 0.30),   # gentle arc
    (102, 24, 1.2, 25.0, False, 0.40),   # faster
    (103, 40, None, 8.0, True, 2.00),    # harsh closed loop: 9 deg/frame
]


def _run(seed, n, speed, radius, closed, loop_on):
    cfg = tiny_config(icp_iters=30).replace(
        loop_closure_enabled=loop_on, loop_time_gap=3.0,
        history_search_num=10, history_fitness_score=0.5)
    if closed:
        poses = synthetic.loop_trajectory(n, radius=radius, closed=True)
    else:
        poses = synthetic.loop_trajectory(n, radius=radius, speed=speed,
                                          closed=False)
    world = synthetic.make_world(seed=seed, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=seed)
    pipe = SlamPipeline(cfg)
    est = pipe.run_scanned(pts, mask)
    return metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False), pipe


def test_golden_arc():
    ate, _ = _run(101, 24, 0.5, 30.0, False, loop_on=False)
    assert ate < 0.30, ate


def test_golden_fast_arc():
    ate, _ = _run(102, 24, 1.2, 25.0, False, loop_on=False)
    assert ate < 0.40, ate


def test_golden_closed_loop():
    ate, pipe = _run(103, 40, None, 8.0, True, loop_on=True)
    assert ate < 2.00, ate
