"""Loop-closure consistency gates (round-4 verdict item 10): a loop factor
must be rejected when its correction is implausible against the odometry
chain — by BUDGET (pre-solve) or by CHAIN BEND (post-solve rollback) — even
when the geometric alignment itself looks acceptable."""

import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models import laser_mapping as lm
from tests.test_sharded_mapping import _loop_ready_state


BASE = dict(max_keyframes=64, loop_time_gap=30.0, history_search_num=3,
            history_fitness_score=0.5, icp_iters=40)


def _drift_latest(ms, T_pre, in_chain=False):
    """Drift the latest keyframe pose by T_pre.  With ``in_chain`` the
    odometry MEASUREMENT follows the drifted pose (the realistic case: the
    chain genuinely believes the wrong pose), so a correcting loop factor
    conflicts with the chain instead of being absorbable exactly."""
    from alego_tpu.ops import se3

    latest = int(ms.graph.count) - 1
    T = np.asarray(ms.graph.poses[latest])
    drifted = jnp.asarray((T_pre @ T).astype(np.float32))
    g = ms.graph._replace(poses=ms.graph.poses.at[latest].set(drifted))
    if in_chain:
        rel = se3.inv_mat(g.poses[latest - 1]) @ drifted
        g = g._replace(chain_rel=g.chain_rel.at[latest].set(rel))
    return ms._replace(graph=g)


def test_correction_budget_rejects_oversized_loop():
    """An 8 m 'drift' on a ~17 m path: the coarse aligner + ICP CAN align it
    (the world cloud is shared), but odometry cannot plausibly have drifted
    8 m over 17 m — the correction-budget gate must refuse the factor.
    On self-similar streets such an alignment is exactly how a false loop
    slips in; the fitness gate alone cannot tell (it looks perfect)."""
    cfg = tiny_config(**BASE)
    T_pre = np.eye(4, dtype=np.float32)
    T_pre[:3, 3] = [5.7, -5.7, 0.0]           # 8.06 m translation drift
    ms = _drift_latest(_loop_ready_state(cfg), T_pre)

    ms2, closed, fitness = lm.loop_closure_step(ms, cfg)
    assert int(ms2.loop_attempts) == 1        # the attempt ran
    assert not bool(closed), (
        f"oversized correction accepted (fitness {float(fitness)})")
    assert int(ms2.graph.loop_count) == 0

    # control: the same scene with a PLAUSIBLE 1.5 m drift must close
    cfg_ok = cfg
    T_small = np.eye(4, dtype=np.float32)
    T_small[:3, 3] = [1.1, -1.0, 0.0]
    ms_s = _drift_latest(_loop_ready_state(cfg_ok), T_small)
    ms3, closed3, _ = lm.loop_closure_step(ms_s, cfg_ok)
    assert bool(closed3), "plausible correction was wrongly rejected"
    assert int(ms3.graph.loop_count) == 1


def test_chain_bend_rollback():
    """Post-solve rollback: when the odometry chain GENUINELY believes the
    drifted pose (measurement drifted too, the realistic case), absorbing a
    correcting loop bends every link by ~correction/N — with a tight bend
    tolerance the otherwise-accepted factor must be rolled back, leaving
    poses untouched."""
    cfg = tiny_config(**BASE, loop_chain_bend_max=0.02,
                      loop_chain_bend_max_rot_deg=0.05)
    T_small = np.eye(4, dtype=np.float32)
    T_small[:3, 3] = [1.1, -1.0, 0.0]     # 1.5 m over 11 links ~ 0.14 m/link
    ms = _drift_latest(_loop_ready_state(cfg), T_small, in_chain=True)
    ms2, closed, _ = lm.loop_closure_step(ms, cfg)
    assert not bool(closed)
    assert int(ms2.graph.loop_count) == 0
    # poses untouched by the rolled-back solve
    assert np.allclose(np.asarray(ms2.graph.poses),
                       np.asarray(ms.graph.poses))

    # control: a workable tolerance accepts the same factor
    cfg_ok = tiny_config(**BASE, loop_chain_bend_max=1.0)
    ms3, closed3, _ = lm.loop_closure_step(
        _drift_latest(_loop_ready_state(cfg_ok), T_small, in_chain=True),
        cfg_ok)
    assert bool(closed3)
