"""Distributed single-map mapping (SURVEY §7 phase 7, VERDICT r2 #7).

Asserts the sharded-association mapping step and the Schur-solver loop
closure produce the single-device results on the 8-device virtual mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.models import laser_mapping as lm
from alego_tpu.models import pose_graph as pg
from alego_tpu.models.image_projection import image_projection
from alego_tpu.models import laser_odometry as lo
from alego_tpu.models import pipeline
from alego_tpu.ops.features import extract_features
from alego_tpu.ops import se3
from alego_tpu.parallel.multichip import make_mesh
from alego_tpu.parallel import sharded_mapping as sm
from alego_tpu.utils import synthetic


def test_sharded_mapping_step_matches_single_device():
    cfg = tiny_config(loop_closure_enabled=False)
    n_warm = 10
    poses = synthetic.loop_trajectory(n_warm + 1, radius=20.0, speed=1.0,
                                      closed=False)
    world = synthetic.make_world(seed=9, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.005)

    state = pipeline.init_state(cfg)
    step = jax.jit(lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg))
    for k in range(n_warm):
        state, _ = step(state, jnp.asarray(pts[k]), jnp.asarray(mask[k]),
                        jnp.float32(k * cfg.scan_period))

    # one more mapping frame, both ways, from the same state
    seg = image_projection(jnp.asarray(pts[n_warm]), jnp.asarray(mask[n_warm]),
                           cfg)
    fc = extract_features(seg, cfg)
    _, T_odom = lo.odometry_step(state.odo, fc, cfg)
    args = (state.mapping, T_odom,
            fc.less_sharp_pts, fc.less_sharp_valid,
            fc.less_flat_pts, fc.less_flat_valid,
            seg.outlier_points, seg.outlier_valid,
            jnp.float32(n_warm * cfg.scan_period))

    ms_ref, T_ref = lm.mapping_step(*args, cfg)
    mesh = make_mesh(8)
    sh_step = sm.make_sharded_mapping_step(cfg, mesh)
    ms_sh, T_sh = sh_step(*args)

    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref), atol=1e-4)
    assert int(ms_sh.graph.count) == int(ms_ref.graph.count)
    n = int(ms_ref.graph.count)
    np.testing.assert_allclose(np.asarray(ms_sh.graph.poses)[:n],
                               np.asarray(ms_ref.graph.poses)[:n], atol=1e-4)


def _loop_ready_state(cfg):
    """A rigid-consistent keyframe ring whose latest keyframe revisits
    keyframe 0: detect_loop fires and ICP aligns structured clouds."""
    rng = np.random.default_rng(4)
    # structured world cloud: two walls + ground patch
    g = np.stack(np.meshgrid(np.linspace(-8, 8, 24),
                             np.linspace(-8, 8, 24)), -1).reshape(-1, 2)
    ground = np.concatenate([g, np.full((len(g), 1), -1.5)], 1)
    w1 = np.stack(np.meshgrid(np.linspace(-8, 8, 24),
                              np.linspace(-1.5, 2.5, 10)), -1).reshape(-1, 2)
    wall1 = np.stack([w1[:, 0], np.full(len(w1), 8.0), w1[:, 1]], 1)
    wall2 = np.stack([np.full(len(w1), -8.0), w1[:, 0], w1[:, 1]], 1)
    W = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    W += rng.normal(0, 0.01, W.shape).astype(np.float32)

    n_kf = 12
    ring = synthetic.loop_trajectory(n_kf, radius=3.0, closed=True)
    ms = lm.init_state(cfg)
    times = []
    for k in range(n_kf):
        T = ring[k].astype(np.float32)
        ms = ms._replace(graph=pg.add_keyframe(ms.graph, jnp.asarray(T)))
        local = (W - T[:3, 3]) @ T[:3, :3]      # world -> keyframe frame
        cap = cfg.kf_surf_cap
        pts = np.zeros((cap, 3), np.float32)
        ok = np.zeros(cap, bool)
        m = min(len(local), cap)
        pts[:m] = local[:m]
        ok[:m] = True
        ms = ms._replace(
            kf_surf=ms.kf_surf.at[k].set(jnp.asarray(pts)),
            kf_surf_valid=ms.kf_surf_valid.at[k].set(jnp.asarray(ok)))
        times.append(k * 10.0)                  # 10 s apart: gap satisfied
    ms = ms._replace(kf_times=ms.kf_times.at[:n_kf].set(
        jnp.asarray(times, jnp.float32)))
    return ms


def test_sharded_loop_closure_matches_single_device():
    cfg = tiny_config(max_keyframes=64, loop_time_gap=30.0,
                      history_search_num=3, history_fitness_score=0.5,
                      icp_iters=25)
    ms = _loop_ready_state(cfg)

    ms_ref, closed_ref, fit_ref = lm.loop_closure_step(ms, cfg)
    assert bool(closed_ref), f"reference closure did not fire (fit {fit_ref})"

    mesh = make_mesh(8)
    sh_loop = sm.make_sharded_loop_closure_step(cfg, mesh)
    ms_sh, closed_sh, fit_sh = sh_loop(ms)
    assert bool(closed_sh)
    np.testing.assert_allclose(float(fit_sh), float(fit_ref), atol=1e-5)
    n = int(ms_ref.graph.count)
    np.testing.assert_allclose(np.asarray(ms_sh.graph.poses)[:n],
                               np.asarray(ms_ref.graph.poses)[:n], atol=2e-3)
