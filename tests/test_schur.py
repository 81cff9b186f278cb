import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alego_tpu.models import pose_graph as pg
from alego_tpu.parallel.multichip import make_mesh
from alego_tpu.parallel import schur
from alego_tpu.ops import se3

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _make_graph(N, n_loops, seed=0):
    rng = np.random.default_rng(seed)
    g = pg.init_graph(N, 8)
    cur = np.eye(4, dtype=np.float32)
    abs_poses = []
    for k in range(N):
        abs_poses.append(cur.copy())
        g = pg.add_keyframe(g, jnp.asarray(cur))
        p = rng.uniform(-0.05, 0.05, 6).astype(np.float32)
        p[0] += 1.0
        cur = (cur @ np.asarray(se3.params_to_mat(jnp.asarray(p)))).astype(np.float32)
    # perturb estimates
    noisy = np.stack(abs_poses)
    for k in range(1, N):
        d = rng.uniform(-0.03, 0.03, 6).astype(np.float32)
        noisy[k] = noisy[k] @ np.asarray(se3.se3_exp(jnp.asarray(d)))
    g = g._replace(poses=jnp.asarray(noisy))
    # loop factors between ends using true relative pose
    for l in range(n_loops):
        i, j = N - 1 - l, l
        rel = np.linalg.inv(abs_poses[i]) @ abs_poses[j]
        g = pg.add_loop_factor(g, jnp.int32(i), jnp.int32(j),
                               jnp.asarray(rel.astype(np.float32)),
                               jnp.float32(50.0))
    return g, np.stack(abs_poses)


@needs_8
def test_schur_matches_dense_solver():
    N = 32
    mesh = make_mesh(8)
    sigma = (1e-4,) * 6
    g, truth = _make_graph(N, n_loops=2, seed=3)

    dense = pg.optimize(g, sigma, iters=5)
    solver = schur.make_schur_solver(mesh, N, sigma, iters=5)
    dist = solver(g)

    np.testing.assert_allclose(np.asarray(dist.poses)[:N],
                               np.asarray(dense.poses)[:N], atol=5e-3)
    # both near the chain-consistent truth
    err = np.abs(np.asarray(dist.poses)[:N] - truth).max()
    assert err < 0.05, err


@needs_8
def test_schur_single_iteration_exact():
    """One Schur GN step == one dense GN step (exact elimination)."""
    N = 32
    mesh = make_mesh(8)
    sigma = (1e-4,) * 6
    g, _ = _make_graph(N, n_loops=1, seed=4)

    dense1 = pg.optimize(g, sigma, iters=1)
    solver = schur.make_schur_solver(mesh, N, sigma, iters=1)
    dist1 = solver(g)
    np.testing.assert_allclose(np.asarray(dist1.poses)[:N],
                               np.asarray(dense1.poses)[:N], atol=2e-3)
