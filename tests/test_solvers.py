import numpy as np
import jax
import jax.numpy as jnp

from alego_tpu.ops import knn, residuals, gauss_newton, eig3, se3


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.uniform(-10, 10, (37, 3)).astype(np.float32)
    r = rng.uniform(-10, 10, (533, 3)).astype(np.float32)
    rmask = rng.random(533) < 0.7
    qmask = np.ones(37, bool)
    d, i = knn.knn(jnp.asarray(q), jnp.asarray(qmask), jnp.asarray(r),
                   jnp.asarray(rmask), k=5, chunk=128)
    d, i = np.asarray(d), np.asarray(i)
    d2_full = ((q[:, None] - r[None]) ** 2).sum(-1)
    d2_full[:, ~rmask] = np.inf
    want_i = np.argsort(d2_full, axis=1)[:, :5]
    want_d = np.take_along_axis(d2_full, want_i, 1)
    np.testing.assert_allclose(d, want_d, rtol=1e-3, atol=1e-3)
    # indices may differ on exact ties; distances must match
    got_d = np.take_along_axis(d2_full, i, 1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-3)


def test_line_residual_and_jacobian_vs_autodiff():
    rng = np.random.default_rng(1)
    N = 64
    params = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
    cp = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    pj = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    pl = jnp.asarray(pj + rng.uniform(-2, 2, (N, 3)).astype(np.float32))

    r, J = residuals.point_to_line(params, cp, pj, pl)
    J_auto = jax.jacfwd(lambda p: residuals.point_to_line(p, cp, pj, pl)[0])(params)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=5e-3)


def test_plane3pt_residual_and_jacobian_vs_autodiff():
    rng = np.random.default_rng(2)
    N = 64
    params = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
    cp = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    pj = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    pl = jnp.asarray(pj + rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    pm = jnp.asarray(pj + rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    r, J = residuals.point_to_plane_3pt(params, cp, pj, pl, pm)
    J_auto = jax.jacfwd(lambda p: residuals.point_to_plane_3pt(p, cp, pj, pl, pm)[0])(params)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=5e-3)


def test_fitted_plane_jacobian_vs_autodiff():
    rng = np.random.default_rng(3)
    N = 32
    params = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
    cp = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    n = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d0 = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))
    r, J = residuals.point_to_plane_fitted(params, cp, jnp.asarray(n), d0)
    J_auto = jax.jacfwd(
        lambda p: residuals.point_to_plane_fitted(p, cp, jnp.asarray(n), d0)[0])(params)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=5e-3)


def test_gn_recovers_pose_from_plane_residuals():
    """Synthetic full-6DoF registration: points on 3 orthogonal planes."""
    rng = np.random.default_rng(4)
    true = np.array([0.3, -0.2, 0.15, 0.04, -0.03, 0.08], np.float32)
    N = 300
    normals = np.repeat(np.eye(3, dtype=np.float32), N // 3, axis=0)
    # target planes: n.x + d = 0 with random offsets
    d0 = np.tile(rng.uniform(-5, 5, 3).astype(np.float32), N // 3 + 1)[:N]
    normals = np.tile(np.eye(3, dtype=np.float32), (N // 3, 1))[:N]
    # choose world points exactly on each plane, then pull back through truth
    pts_w = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    for k in range(N):
        ax = k % 3
        pts_w[k, ax] = -d0[k]
    T = np.asarray(se3.params_to_mat(jnp.asarray(true)))
    pts_l = (pts_w - T[:3, 3]) @ T[:3, :3]  # R^T (p - t)

    cp = jnp.asarray(pts_l)
    nrm = jnp.asarray(normals)
    dd = jnp.asarray(d0)
    w = jnp.ones(N, jnp.float32)

    def res_fn(p):
        r, J = residuals.point_to_plane_fitted(p, cp, nrm, dd)
        return r, J, w

    sol = gauss_newton.solve_gn(res_fn, jnp.zeros(6, jnp.float32), 10,
                                gauss_newton.FULL_DIMS, huber_delta=0.1)
    np.testing.assert_allclose(np.asarray(sol), true, atol=1e-3)


def test_gn_dim_mask_freezes_params():
    rng = np.random.default_rng(5)
    N = 100
    cp = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    nrm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (N // 3 + 1, 1))[:N])
    dd = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))
    w = jnp.ones(N, jnp.float32)

    def res_fn(p):
        r, J = residuals.point_to_plane_fitted(p, cp, nrm, dd)
        return r, J, w

    sol = gauss_newton.solve_gn(res_fn, jnp.zeros(6, jnp.float32), 5,
                                gauss_newton.SURF_DIMS, huber_delta=0.1)
    s = np.asarray(sol)
    assert s[2] != 0.0
    np.testing.assert_array_equal(s[[0, 1, 3, 4, 5]], 0.0)


def test_eig3_matches_numpy():
    rng = np.random.default_rng(6)
    A = rng.normal(size=(50, 3, 3)).astype(np.float32)
    C = A @ A.transpose(0, 2, 1)
    ev = np.asarray(eig3.sym_eigvals_3x3(jnp.asarray(C)))
    want = np.linalg.eigvalsh(C)
    np.testing.assert_allclose(ev, want, rtol=1e-3, atol=1e-3)
    v = np.asarray(eig3.principal_direction(jnp.asarray(C), jnp.asarray(ev)))
    # Cv = l2 v
    Cv = np.einsum("nij,nj->ni", C, v)
    np.testing.assert_allclose(Cv, ev[:, 2:3] * v, rtol=2e-2, atol=2e-2)


def test_pca_line_fit_detects_line():
    rng = np.random.default_rng(7)
    t = rng.uniform(-1, 1, (1, 5, 1)).astype(np.float32)
    direction = np.array([[0.6, 0.8, 0.0]], np.float32)
    pts = t * direction[:, None, :] + rng.normal(0, 0.01, (1, 5, 3)).astype(np.float32)
    valid = np.ones((1, 5), bool)
    center, d, ev = eig3.pca_line_fit(jnp.asarray(pts), jnp.asarray(valid))
    ev = np.asarray(ev)
    assert ev[0, 2] > 3 * ev[0, 1]
    got = np.abs(np.asarray(d)[0] @ direction[0])
    assert got > 0.99


def test_plane_fit():
    rng = np.random.default_rng(8)
    # points on plane z = 2 (n = (0,0,-0.5) solving n.p = -1)
    pts = rng.uniform(-5, 5, (1, 5, 3)).astype(np.float32)
    pts[..., 2] = 2.0
    valid = np.ones((1, 5), bool)
    n, d0, ok = eig3.plane_fit(jnp.asarray(pts), jnp.asarray(valid), tol=0.2)
    assert bool(np.asarray(ok)[0])
    nn = np.asarray(n)[0]
    np.testing.assert_allclose(np.abs(nn), [0, 0, 1], atol=1e-3)
    # plane eq: n.p + d0 = 0 for p on plane
    np.testing.assert_allclose(nn[2] * 2.0 + np.asarray(d0)[0], 0.0, atol=1e-3)


def test_det3_matches_numpy():
    """Closed-form 3x3 det (the TPU fast path replacing the batched-LU
    lowering of jnp.linalg.det) vs numpy."""
    rng = np.random.default_rng(11)
    A = rng.normal(size=(200, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(eig3.det_3x3(jnp.asarray(A))),
                               np.linalg.det(A), rtol=1e-4, atol=1e-4)


def test_spd_solve3_matches_lu():
    """Closed-form SPD Cholesky (the TPU fast path in plane_fit) vs the
    LU lowering on realistic plane-fit normal equations, incl. the
    far-from-origin conditioning the fits see at map scale."""
    rng = np.random.default_rng(13)
    base = rng.normal(size=(128, 1, 3)).astype(np.float32) * 20
    pts = base + rng.normal(size=(128, 5, 3)).astype(np.float32)
    AtA = np.einsum("nki,nkj->nij", pts, pts) + 1e-6 * np.eye(3)
    b = -pts.sum(1)
    x = np.asarray(eig3.solve_spd_3x3(jnp.asarray(AtA.astype(np.float32)),
                                      jnp.asarray(b)))
    want = np.linalg.solve(AtA, b[..., None])[..., 0]   # f64 truth
    # agreement to the f32 conditioning limit of the system itself (the LU
    # f32 path deviates comparably; see the variance-study note in eig3)
    scale = np.abs(want).max(-1)
    np.testing.assert_allclose(x / scale[:, None], want / scale[:, None],
                               atol=2e-2)


def test_rotation_from_covariance_matches_svd_kabsch():
    """Closed-form Kabsch (the TPU fast path in ICP) must reach the same
    tr(R S) optimum as the SVD construction, incl. reflection and
    rank-deficient covariances (coplanar/collinear correspondence sets)."""
    rng = np.random.default_rng(20)

    def svd_kabsch(S):
        U, _, Vt = np.linalg.svd(S)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        D = np.diag([1.0, 1.0, d])
        return Vt.T @ D @ U.T

    cases = [rng.normal(size=(3, 3)) for _ in range(50)]
    # realistic ICP covariance scale (weight-sum x metre^2 ~ 1e6): squared
    # Cayley-Hamilton column norms overflow f32 without the internal
    # Frobenius normalisation (the bug that silently corrupted every loop
    # closure before it was caught by the multi-seed study)
    cases += [rng.normal(size=(3, 3)) * 10.0 ** rng.uniform(-8, 10)
              for _ in range(30)]
    # near-degenerate top eigenplane (disc-like scatter)
    for _ in range(10):
        q = svd_kabsch(rng.normal(size=(3, 3)))
        cases.append(q @ np.diag([1.0, 1.0 - 10.0 ** rng.uniform(-7, -3),
                                  rng.uniform(0, 0.2)]) @ svd_kabsch(rng.normal(size=(3, 3))))
    # reflective (negative det)
    cases += [-np.abs(np.diag(rng.uniform(0.5, 2, 3))) @ svd_kabsch(rng.normal(size=(3, 3)))
              for _ in range(10)]
    # rank-2 / rank-1
    for _ in range(10):
        a, b = rng.normal(size=(2, 3))
        cases.append(np.outer(a, b) + 0.3 * np.outer(rng.normal(size=3), rng.normal(size=3)) * 0)
        cases.append(np.outer(a, b) + np.outer(rng.normal(size=3), rng.normal(size=3)))
    # S ~ 0 (zero in-range correspondences, or a single centred point):
    # must return a proper rotation ~ IDENTITY, not an arbitrary frame —
    # unpaired degenerate fallbacks once made R(0) a fixed 90-deg rotation
    # that spun every bad-candidate ICP attempt
    cases += [np.zeros((3, 3)), np.eye(3) * 1e-20, np.full((3, 3), 1e-25)]
    for S in [np.zeros((3, 3)), np.eye(3) * 1e-20]:
        R0 = np.asarray(eig3.rotation_from_covariance(jnp.asarray(S, jnp.float32)))
        np.testing.assert_allclose(R0, np.eye(3), atol=1e-4)
        S32 = jnp.asarray(S, jnp.float32)
        R = np.asarray(eig3.rotation_from_covariance(S32))
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(R) > 0.999
        # same objective as the SVD optimum
        got = np.trace(R @ S)
        want = np.trace(svd_kabsch(S) @ S)
        assert got >= want - 1e-3 * max(1.0, abs(want)), (got, want)


def test_degeneracy_projection_freezes_unobservable_dims():
    """solve_gn with eig_floor (LOAM isDegenerate equivalent): constraints
    that only observe x and y must leave z at the warm start instead of
    taking an unbounded step along the H null space, while still converging
    the observed dims."""
    from alego_tpu.ops.gauss_newton import solve_gn, FULL_DIMS

    rng = np.random.default_rng(3)
    n = 64
    # planes with normals in the xy plane only: z unobservable
    theta = rng.uniform(0, 2 * np.pi, n)
    normals = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)], -1)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    target = np.array([0.3, -0.2, 0.0, 0.0, 0.0, 0.0], np.float32)
    offs = -(normals * (pts + target[:3])).sum(-1)

    def res_fn(p):
        moved = pts + p[:3]   # rotation ~ 0 in this toy
        r = (normals * moved).sum(-1) + offs
        J = np.zeros((n, 6), np.float32)
        J[:, :3] = normals
        return jnp.asarray(r), jnp.asarray(J), jnp.ones(n)

    p0 = jnp.asarray([0.0, 0.0, 0.123, 0.0, 0.0, 0.0], jnp.float32)
    p = np.asarray(solve_gn(res_fn, p0, 10, FULL_DIMS, huber_delta=10.0,
                            eig_floor=1.0))
    np.testing.assert_allclose(p[:2], target[:2], atol=1e-3)
    # z frozen at the warm start, not dragged by the singular solve
    assert abs(p[2] - 0.123) < 1e-5, p


def test_plane_fit_far_degenerate_is_finite():
    """f32 plane fits on near-collinear neighbour sets at ~100 m coordinates
    must stay finite (round-2 root cause: absolute ridge left cond >> 2^24,
    Cholesky back-substitution overflowed to NaN and the non-finite-H guard
    froze whole scan-to-map solves — benchmarks/map_spectrum.py)."""
    import jax.numpy as jnp
    from alego_tpu.ops.eig3 import plane_fit

    rng = np.random.default_rng(0)
    base = np.array([80.0, -60.0, 1.5], np.float32)
    d = np.array([0.8, 0.6, 0.0], np.float32)
    # 5 nearly-collinear points along d with ~1 mm off-line jitter
    nbrs = base + np.outer(np.linspace(0, 2, 5), d)
    nbrs = (nbrs + rng.normal(0, 1e-3, nbrs.shape)).astype(np.float32)
    batch = jnp.asarray(np.tile(nbrs[None], (64, 1, 1)))
    unit_n, d0, ok = plane_fit(batch, jnp.ones((64, 5), bool), 0.2)
    assert np.isfinite(np.asarray(unit_n)).all()
    assert np.isfinite(np.asarray(d0)).all()
    # well-conditioned fits unaffected by the relative ridge
    good = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0.0], [0, 1, 0],
                                 [1, 1, 0], [0.5, 0.5, 0]], np.float32)
                       + np.array([50, 50, -1.5], np.float32))[None]
    n2, dd2, ok2 = plane_fit(good, jnp.ones((1, 5), bool), 0.2)
    assert bool(np.asarray(ok2)[0])
    assert abs(abs(float(np.asarray(n2)[0, 2])) - 1.0) < 1e-3


def test_solve_gn_survives_nan_rows():
    """A few NaN residual/Jacobian rows must be dropped, not freeze the
    solve (round 2's silent inert-mapping failure mode)."""
    from alego_tpu.ops.gauss_newton import solve_gn, FULL_DIMS

    rng = np.random.default_rng(3)
    A = rng.normal(size=(64, 6)).astype(np.float32)
    x_true = rng.normal(size=6).astype(np.float32)
    b = A @ x_true

    def res_fn(p):
        r = jnp.asarray(A) @ p - jnp.asarray(b)
        J = jnp.asarray(A)
        r = r.at[3].set(jnp.nan)
        J = J.at[10, 2].set(jnp.inf)
        return r, J, jnp.ones(64)

    p = solve_gn(res_fn, jnp.zeros(6, jnp.float32), 10, FULL_DIMS,
                 huber_delta=1e9, param_tol=1e-7)
    assert np.isfinite(np.asarray(p)).all()
    np.testing.assert_allclose(np.asarray(p), x_true, atol=1e-3)
    # with the eigen-floor projector enabled too (mapping's configuration)
    p2 = solve_gn(res_fn, jnp.zeros(6, jnp.float32), 10, FULL_DIMS,
                  huber_delta=1e9, param_tol=1e-7, eig_floor=0.5)
    np.testing.assert_allclose(np.asarray(p2), x_true, atol=1e-3)
