import numpy as np
import jax.numpy as jnp

from alego_tpu.models import pose_graph as pg
from alego_tpu.ops import se3


def _graph_with_loops(N, cap, n_loops, seed):
    rng = np.random.default_rng(seed)
    g = pg.init_graph(cap, 8)
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


def test_fast_matches_dense_no_loops():
    g, truth = _graph_with_loops(20, 32, 0, seed=0)
    sigma = (1e-4,) * 6
    dense = pg.optimize(g, sigma, iters=3)
    fast = pg.optimize_fast(g, sigma, iters=3)
    np.testing.assert_allclose(np.asarray(fast.poses)[:20],
                               np.asarray(dense.poses)[:20], atol=5e-3)


def test_fast_matches_dense_with_loops():
    g, truth = _graph_with_loops(24, 32, 3, seed=1)
    sigma = (1e-4,) * 6
    dense = pg.optimize(g, sigma, iters=3)
    fast = pg.optimize_fast(g, sigma, iters=3)
    np.testing.assert_allclose(np.asarray(fast.poses)[:24],
                               np.asarray(dense.poses)[:24], atol=8e-3)
    # and both land near truth
    assert np.abs(np.asarray(fast.poses)[:24] - truth).max() < 0.06


def test_fast_non_pow2_capacity():
    g, _ = _graph_with_loops(10, 24, 1, seed=2)   # capacity 24 pads to 32
    fast = pg.optimize_fast(g, (1e-4,) * 6, iters=2)
    assert np.isfinite(np.asarray(fast.poses)).all()


def test_tiered_dense_solve_at_full_scale():
    """512-capacity graph, long active chain + loops: the tiered dense GN
    (prefix-sized pivoted LU) converges to the chain/loop-consistent truth.
    (optimize_fast is excluded here: unpivoted f32 elimination diverges on
    stiff chains at this depth — documented in its docstring.)"""
    g, truth = _graph_with_loops(480, 512, 4, seed=5)
    sigma = (1e-4,) * 6
    dense = pg.optimize(g, sigma, iters=8)
    err = np.abs(np.asarray(dense.poses)[:480] - truth).max()
    # every pose independently perturbed +-0.04 is far harsher than real
    # graphs (drift is locally smooth); f32 GN lands within ~1.5 here
    assert err < 2.0, err


def test_tiered_solve_small_count_in_large_capacity():
    """count < 64 in a 512-capacity graph uses the smallest solve tier and
    still matches truth."""
    g, truth = _graph_with_loops(20, 512, 1, seed=6)
    dense = pg.optimize(g, (1e-4,) * 6, iters=3)
    err = np.abs(np.asarray(dense.poses)[:20] - truth).max()
    assert err < 0.05, err


def test_sparse_tiered_optimize_matches_dense_oracle():
    for (n, cap, loops, seed) in ((24, 32, 3, 7), (100, 128, 4, 8)):
        g, _ = _graph_with_loops(n, cap, loops, seed=seed)
        sigma = (1e-4,) * 6
        a = pg.optimize_dense(g, sigma, iters=3)
        b = pg.optimize(g, sigma, iters=3)
        np.testing.assert_allclose(np.asarray(b.poses)[:n],
                                   np.asarray(a.poses)[:n], atol=1e-2)
