"""Golden-trajectory regression: fixed scenarios must keep meeting their
accuracy envelopes (SURVEY §4: the test strategy the reference lacked).

MULTI-SEED MEDIANS, not single runs.  Measured 2026-08: the pipeline is a
recursive system that amplifies ulp-level rounding differences into chaotic
per-seed trajectory divergence — solver lowerings that agree to <0.1 deg in
every plane fit (Cholesky vs LU vs f64) still produce 2-4x single-seed ATE
differences with NO systematic bias (medians agree to a few %; see
ops/eig3.plane_fit docstring).  A single-seed golden therefore pins one
rounding path, not accuracy: it fails on harmless lowering changes and can
pass on real regressions that happen to land a lucky seed.  Each scenario
asserts (a) the MEDIAN ATE over three render seeds against a ~2x-measured
envelope — a genuine 50% accuracy regression shifts every seed and moves the
median — and (b) a loose per-seed catastrophe bound.

Measured (Cholesky plane fit + closed-form Kabsch + map_eig_floor=1, 2026-08):
  arc101  [0.033, 0.103, 0.041] med 0.041   fast102 [0.097, 0.292, 0.202] med 0.202
  loop103 [0.441, 0.089, 0.326] med 0.326 (loops 1/1/1)
  harsh103 [1.286, 1.326, 0.783] med 1.286 (deliberately past the matcher's
  envelope; loops often rejected; the eigen-floor freezes unobservable
  directions instead of accepting lucky corrections, trading this scene's
  ATE for bounded tails)
"""

import numpy as np

from alego_tpu.config import tiny_config
from alego_tpu.models.pipeline import SlamPipeline
from alego_tpu.utils import synthetic, metrics

SEEDS = (0, 1, 2)


def _run(world_seed, n, speed, radius, closed, loop_on, noise_seed):
    cfg = tiny_config(icp_iters=30).replace(
        loop_closure_enabled=loop_on, loop_time_gap=3.0,
        history_search_num=10, history_fitness_score=0.5)
    if closed:
        poses = synthetic.loop_trajectory(n, radius=radius, closed=True)
    else:
        poses = synthetic.loop_trajectory(n, radius=radius, speed=speed,
                                          closed=False)
    world = synthetic.make_world(seed=world_seed, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=noise_seed)
    pipe = SlamPipeline(cfg)
    est = pipe.run_scanned(pts, mask)
    ate = float(metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False))
    return ate, int(pipe.state.mapping.graph.loop_count)


def _median_run(world_seed, n, speed, radius, closed, loop_on):
    res = [_run(world_seed, n, speed, radius, closed, loop_on, s)
           for s in SEEDS]
    ates = [r[0] for r in res]
    loops = [r[1] for r in res]
    return float(np.median(ates)), max(ates), loops


def test_golden_arc():
    med, worst, _ = _median_run(101, 24, 0.5, 30.0, False, loop_on=False)
    assert med < 0.1, f"median {med}"       # measured 0.041
    assert worst < 0.4, f"worst seed {worst}"


def test_golden_fast_arc():
    med, worst, _ = _median_run(102, 24, 1.2, 25.0, False, loop_on=False)
    assert med < 0.35, f"median {med}"      # measured 0.202
    assert worst < 1.2, f"worst seed {worst}"


def test_golden_closed_loop():
    """Full circuit with a real loop closure: the loop must FIRE on most
    seeds and the loop-corrected median ATE must hold its envelope."""
    med, worst, loops = _median_run(103, 60, None, 10.0, True, loop_on=True)
    assert sum(l >= 1 for l in loops) >= 2, f"loops fired {loops}"
    assert med < 0.5, f"median {med}"       # measured 0.326, loops 1/1/1
    assert worst < 1.5, f"worst seed {worst}"


def test_harsh_closed_loop_stays_bounded():
    """9 deg/frame circle: deliberately beyond the scan-matching comfort
    zone (the loop ICP legitimately rejects on some seeds). Robustness
    envelope only: finite, bounded drift."""
    med, worst, _ = _median_run(103, 40, None, 8.0, True, loop_on=True)
    assert np.isfinite(worst)
    assert med < 2.0, f"median {med}"       # measured 1.286
    assert worst < 4.0, f"worst seed {worst}"
