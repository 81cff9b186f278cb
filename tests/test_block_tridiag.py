import numpy as np
import jax.numpy as jnp

from alego_tpu.ops.block_tridiag import block_tridiag_solve


def _random_spd_tridiag(N, rng, coupling=0.3):
    """SPD block-tridiagonal system (diagonally dominant)."""
    D = np.zeros((N, 6, 6), np.float32)
    U = np.zeros((N, 6, 6), np.float32)
    L = np.zeros((N, 6, 6), np.float32)
    for i in range(N):
        A = rng.normal(size=(6, 6)).astype(np.float32)
        D[i] = A @ A.T + 6 * np.eye(6, dtype=np.float32)
    for i in range(N - 1):
        C = coupling * rng.normal(size=(6, 6)).astype(np.float32)
        U[i] = C
        L[i + 1] = C.T
    return D, L, U


def _dense(D, L, U):
    N = D.shape[0]
    H = np.zeros((N * 6, N * 6), np.float32)
    for i in range(N):
        H[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6] = D[i]
        if i + 1 < N:
            H[i * 6:(i + 1) * 6, (i + 1) * 6:(i + 2) * 6] = U[i]
            H[(i + 1) * 6:(i + 2) * 6, i * 6:(i + 1) * 6] = L[i + 1]
    return H


def test_cyclic_reduction_matches_dense():
    rng = np.random.default_rng(0)
    for N in (2, 4, 8, 32, 128):
        D, L, U = _random_spd_tridiag(N, rng)
        K = 3
        B = rng.normal(size=(N, 6, K)).astype(np.float32)
        X = np.asarray(block_tridiag_solve(jnp.asarray(D), jnp.asarray(L),
                                           jnp.asarray(U), jnp.asarray(B)))
        H = _dense(D, L, U)
        want = np.linalg.solve(H.astype(np.float64),
                               B.transpose(0, 1, 2).reshape(N * 6, K))
        np.testing.assert_allclose(X.reshape(N * 6, K), want, rtol=2e-3,
                                   atol=2e-3)


def test_cyclic_reduction_decoupled_identity_blocks():
    """Inactive (identity, zero-coupling) tail blocks don't disturb the head."""
    rng = np.random.default_rng(1)
    N, act = 16, 5
    D, L, U = _random_spd_tridiag(act, rng)
    Df = np.tile(np.eye(6, dtype=np.float32), (N, 1, 1))
    Lf = np.zeros((N, 6, 6), np.float32)
    Uf = np.zeros((N, 6, 6), np.float32)
    Df[:act] = D
    Lf[:act] = L
    Uf[:act - 1] = U[:act - 1]
    Uf[act - 1] = 0
    B = np.zeros((N, 6, 1), np.float32)
    B[:act] = rng.normal(size=(act, 6, 1)).astype(np.float32)
    X = np.asarray(block_tridiag_solve(jnp.asarray(Df), jnp.asarray(Lf),
                                       jnp.asarray(Uf), jnp.asarray(B)))
    H = _dense(D, L, U)
    want = np.linalg.solve(H.astype(np.float64), B[:act].reshape(act * 6, 1))
    np.testing.assert_allclose(X[:act].reshape(act * 6, 1), want, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(X[act:], 0, atol=1e-6)


def test_thomas_matches_dense_stiff_chain():
    """Thomas stays stable on the stiff, non-diagonally-dominant chains that
    break cyclic reduction."""
    from alego_tpu.ops.block_tridiag import block_thomas_solve

    rng = np.random.default_rng(3)
    N = 512
    C = np.eye(6, dtype=np.float32) * 1e4
    D = np.tile(2 * C + np.eye(6, dtype=np.float32), (N, 1, 1))
    U = np.tile(-C, (N, 1, 1)); U[-1] = 0
    L = np.tile(-C, (N, 1, 1)); L[0] = 0
    B = rng.normal(size=(N, 6, 2)).astype(np.float32)
    X = np.asarray(block_thomas_solve(jnp.asarray(D), jnp.asarray(L),
                                      jnp.asarray(U), jnp.asarray(B)))
    H = _dense(D, L, U)
    want = np.linalg.solve(H.astype(np.float64), B.reshape(N * 6, 2))
    denom = np.abs(want).max()
    assert np.abs(X.reshape(N * 6, 2) - want).max() / denom < 1e-3
