import numpy as np
import jax
import jax.numpy as jnp

from alego_tpu.ops import icp, se3
from alego_tpu.models import pose_graph as pg


def test_icp_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-10, 10, (800, 3)).astype(np.float32)
    true = np.array([0.4, -0.3, 0.2, 0.03, -0.02, 0.1], np.float32)
    T = np.asarray(se3.params_to_mat(jnp.asarray(true)))
    # source = targets pulled back through the true transform (so src->tgt = T)
    src = (tgt - T[:3, 3]) @ T[:3, :3]
    res = icp.icp_point_to_point(
        jnp.asarray(src), jnp.ones(800, bool), jnp.asarray(tgt),
        jnp.ones(800, bool), iters=50, max_corr_dist=5.0)
    got = np.asarray(res.transform)
    np.testing.assert_allclose(got, T, atol=5e-3)
    assert float(res.fitness) < 1e-3
    assert bool(res.converged)


def test_icp_fitness_high_on_mismatch():
    rng = np.random.default_rng(1)
    a = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    b = rng.uniform(40, 60, (300, 3)).astype(np.float32)  # disjoint cloud
    res = icp.icp_point_to_point(
        jnp.asarray(a), jnp.ones(300, bool), jnp.asarray(b),
        jnp.ones(300, bool), iters=10, max_corr_dist=5.0)
    assert float(res.fitness) > 1.0


def _compose_chain(rels):
    """rels [N, 4, 4] -> absolute poses with pose0 = rels[0]."""
    out = [rels[0]]
    for k in range(1, len(rels)):
        out.append(out[-1] @ rels[k])
    return np.stack(out)


def test_pose_graph_loop_closure_corrects_drift():
    """Drifty odometry chain + exact loop factor -> corrected poses."""
    rng = np.random.default_rng(2)
    N = 24
    # ground truth: square loop (come back to start)
    true_rels = [np.eye(4)]
    for k in range(1, N):
        p = np.zeros(6, np.float32)
        p[0] = 1.0                      # 1 m forward each step
        p[5] = 2 * np.pi / (N - 1)      # constant turn -> closes the loop
        true_rels.append(np.asarray(se3.params_to_mat(jnp.asarray(p))))
    true_rels = np.stack(true_rels).astype(np.float32)
    true_abs = _compose_chain(true_rels)

    # odometry: biased yaw (drift)
    noisy_rels = true_rels.copy()
    for k in range(1, N):
        p = np.array([1.0, 0, 0, 0, 0, 2 * np.pi / (N - 1) + 0.01], np.float32)
        noisy_rels[k] = np.asarray(se3.params_to_mat(jnp.asarray(p)))
    noisy_abs = _compose_chain(noisy_rels)
    drift0 = np.linalg.norm(noisy_abs[-1, :3, 3] - true_abs[-1, :3, 3])

    g = pg.init_graph(32, 8)
    for k in range(N):
        g = pg.add_keyframe(g, jnp.asarray(noisy_abs[k]))
    # exact loop constraint between last and first pose
    rel_true = np.linalg.inv(true_abs[-1]) @ true_abs[0]
    g = pg.add_loop_factor(g, jnp.int32(N - 1), jnp.int32(0),
                           jnp.asarray(rel_true.astype(np.float32)),
                           jnp.float32(100.0))

    chain_sigma = (1e-4,) * 6
    g2 = pg.optimize(g, chain_sigma, iters=10)
    poses = np.asarray(g2.poses)[:N]

    # loop endpoints now consistent with the loop measurement
    err_loop = np.linalg.inv(rel_true) @ np.linalg.inv(poses[-1]) @ poses[0]
    assert np.linalg.norm(err_loop[:3, 3]) < 0.2
    # overall trajectory closer to truth than the drifty input
    ate_before = np.sqrt(((noisy_abs[:, :3, 3] - true_abs[:, :3, 3]) ** 2).sum(-1).mean())
    ate_after = np.sqrt(((poses[:, :3, 3] - true_abs[:, :3, 3]) ** 2).sum(-1).mean())
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)
    # pose 0 pinned by prior
    np.testing.assert_allclose(poses[0], noisy_abs[0], atol=0.05)


def test_pose_graph_no_loops_is_stable():
    """Without loop factors the chain should stay at the odometry solution."""
    rng = np.random.default_rng(3)
    N = 10
    g = pg.init_graph(16, 4)
    abs_poses = []
    cur = np.eye(4, dtype=np.float32)
    for k in range(N):
        abs_poses.append(cur.copy())
        g = pg.add_keyframe(g, jnp.asarray(cur))
        step = np.asarray(se3.params_to_mat(
            jnp.asarray(rng.uniform(-0.2, 0.2, 6).astype(np.float32))))
        cur = (cur @ step).astype(np.float32)
    g2 = pg.optimize(g, (1e-4,) * 6, iters=5)
    np.testing.assert_allclose(np.asarray(g2.poses)[:N], np.stack(abs_poses),
                               atol=1e-3)



def test_icp_hasconverged_criteria():
    """PCL DefaultConvergenceCriteria semantics (gate at LM.cpp:842)."""
    rng = np.random.default_rng(21)
    tgt = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    T = np.asarray(se3.params_to_mat(jnp.asarray(
        [0.3, -0.2, 0.1, 0.02, -0.01, 0.05], jnp.float32)))
    src = (tgt - T[:3, 3]) @ T[:3, :3]
    ok = jnp.ones(256, bool)

    # easy alignment: epsilon-converges well before the budget
    res = icp.icp_point_to_point(jnp.asarray(src), ok, jnp.asarray(tgt), ok,
                                 iters=50, max_corr_dist=10.0,
                                 fail_after_max_iter=True)
    assert bool(res.converged)
    assert int(res.iters) < 50

    # no correspondence within range -> never converged
    far = jnp.asarray(tgt + 1e4)
    res2 = icp.icp_point_to_point(jnp.asarray(src), ok, far, ok,
                                  iters=10, max_corr_dist=1.0)
    assert not bool(res2.converged)

    # budget exhausted without epsilon convergence: PCL default counts as
    # converged; the strict flag does not
    res3 = icp.icp_point_to_point(jnp.asarray(src), ok, jnp.asarray(tgt), ok,
                                  iters=1, max_corr_dist=10.0,
                                  translation_eps=1e-12)
    assert bool(res3.converged)
    res4 = icp.icp_point_to_point(jnp.asarray(src), ok, jnp.asarray(tgt), ok,
                                  iters=1, max_corr_dist=10.0,
                                  translation_eps=1e-12,
                                  fail_after_max_iter=True)
    assert not bool(res4.converged)
