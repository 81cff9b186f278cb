"""SE(3) pose-graph optimisation (T4 — the GTSAM/iSAM2 replacement).

The reference maintains a gtsam ``ISAM2`` with a prior on pose 0, odometry
``BetweenFactor``s along the keyframe chain, and loop-closure between factors
(``/root/reference/src/LM.cpp:197-204, 636-704, 878-882``).  At this system's
scale the honest TPU-native design is batched Gauss-Newton over the whole
graph: the factor set is three fixed-shape arrays (prior, chain, loops), the
residual is the right-trivialised ``Log(Z^-1 Xi^-1 Xj)``, Jacobians use the
standard adjoint closed forms with the small-residual ``Jr^-1 ~ I + ad(r)/2``
approximation, and the normal equations are assembled densely (6N x 6N) and
solved by Cholesky — a few-thousand-dof solve, microseconds of MXU time.

Incremental behaviour mimicking iSAM2's relinearisation policy: between loop
closures the chain is exact (each new keyframe pose is the composed estimate),
so the full solve runs only when a loop factor arrives — matching where the
reference actually spends iSAM2 work (update x2 on loop, LM.cpp:880-881).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3


class PoseGraph(NamedTuple):
    """Fixed-capacity factor-graph state.

    poses:      [N, 4, 4] current estimates (active: [:count])
    chain_rel:  [N, 4, 4] Z_i = X_{i-1}^-1 X_i measured at insertion
                (chain_rel[0] is the prior pose of node 0)
    loop_i/j:   [L] endpoints of loop factors
    loop_rel:   [L, 4, 4] measured relative pose X_i^-1 X_j
    loop_w:     [L] information weight (0 = empty slot)
    count:      scalar int32 active poses
    loop_count: scalar int32 active loop factors
    """

    poses: jnp.ndarray
    chain_rel: jnp.ndarray
    loop_i: jnp.ndarray
    loop_j: jnp.ndarray
    loop_rel: jnp.ndarray
    loop_w: jnp.ndarray
    count: jnp.ndarray
    loop_count: jnp.ndarray


def init_graph(max_kf: int, max_loops: int, dtype=jnp.float32) -> PoseGraph:
    I = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_kf, 4, 4))
    return PoseGraph(
        poses=I, chain_rel=I,
        loop_i=jnp.zeros(max_loops, jnp.int32),
        loop_j=jnp.zeros(max_loops, jnp.int32),
        loop_rel=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_loops, 4, 4)),
        loop_w=jnp.zeros(max_loops, dtype),
        count=jnp.int32(0), loop_count=jnp.int32(0),
    )


def add_keyframe(g: PoseGraph, pose: jnp.ndarray) -> PoseGraph:
    """Append a pose; measured between = prev^-1 @ pose (LM.cpp:655-658).

    At capacity the newest slot is overwritten (graceful degradation; the
    reference grows unboundedly instead, SURVEY §5.7)."""
    cap = g.poses.shape[0]
    k = jnp.minimum(g.count, cap - 1)
    prev = g.poses[jnp.maximum(k - 1, 0)]
    rel = jnp.where(k == 0, pose, se3.inv_mat(prev) @ pose)
    return g._replace(
        poses=g.poses.at[k].set(pose),
        chain_rel=g.chain_rel.at[k].set(rel),
        count=jnp.minimum(g.count + 1, cap),
    )


def add_loop_factor(g: PoseGraph, i, j, rel, weight) -> PoseGraph:
    cap = g.loop_w.shape[0]
    l = jnp.minimum(g.loop_count, cap - 1)
    return g._replace(
        loop_i=g.loop_i.at[l].set(i.astype(jnp.int32)),
        loop_j=g.loop_j.at[l].set(j.astype(jnp.int32)),
        loop_rel=g.loop_rel.at[l].set(rel),
        loop_w=g.loop_w.at[l].set(weight),
        loop_count=jnp.minimum(g.loop_count + 1, cap),
    )


def _between_residual(Xi, Xj, Z):
    """r = Log(Z^-1 Xi^-1 Xj) and Jacobians wrt right-perturbations of i, j."""
    E = se3.inv_mat(Z) @ se3.inv_mat(Xi) @ Xj
    r = se3.se3_log(E)
    # Jr^{-1}(r) ~ I + 0.5 ad(r)
    ad = jnp.zeros(r.shape[:-1] + (6, 6), r.dtype)
    rho, phi = r[..., :3], r[..., 3:]
    ad = ad.at[..., :3, :3].set(se3.hat(phi))
    ad = ad.at[..., :3, 3:].set(se3.hat(rho))
    ad = ad.at[..., 3:, 3:].set(se3.hat(phi))
    I6 = jnp.eye(6, dtype=r.dtype)
    Jr_inv = I6 + 0.5 * ad
    Jj = Jr_inv
    Ji = -Jr_inv @ se3.adjoint(se3.inv_mat(Xj) @ Xi)
    return r, Ji, Jj


def _assemble_and_solve(g: PoseGraph, chain_sigma, loop_w_scale, damping):
    """One GN iteration: dense H delta = -b over 6*N dofs."""
    N = g.poses.shape[0]
    dtype = g.poses.dtype
    idx = jnp.arange(N)
    active = idx < g.count

    # --- chain factors: (i-1) -> i for i in [1, count) ---
    Xi = g.poses[jnp.maximum(idx - 1, 0)]
    Xj = g.poses
    r_c, Ji_c, Jj_c = _between_residual(Xi, Xj, g.chain_rel)
    w_c = (active & (idx > 0)).astype(dtype)
    info_c = 1.0 / jnp.asarray(chain_sigma, dtype)  # [6] diag information

    # --- prior on node 0: r = Log(Z0^-1 X0) ---
    r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
    ad0 = jnp.eye(6, dtype=dtype)  # Jr_inv ~ I for small residual
    w_p = (g.count > 0).astype(dtype)

    # --- loop factors ---
    Xl_i = g.poses[g.loop_i]
    Xl_j = g.poses[g.loop_j]
    r_l, Ji_l, Jj_l = _between_residual(Xl_i, Xl_j, g.loop_rel)
    l_idx = jnp.arange(g.loop_w.shape[0])
    w_l = jnp.where(l_idx < g.loop_count, g.loop_w, 0.0) * loop_w_scale

    # --- dense assembly ---
    H = jnp.zeros((N, N, 6, 6), dtype)
    b = jnp.zeros((N, 6), dtype)

    def add_factor(H, b, i, j, r, Ji, Jj, w, info):
        WJi = Ji * (w[..., None, None] * info[None, :, None])
        WJj = Jj * (w[..., None, None] * info[None, :, None])
        H = H.at[i, i].add(jnp.einsum("nki,nkj->nij", Ji, WJi))
        H = H.at[j, j].add(jnp.einsum("nki,nkj->nij", Jj, WJj))
        H = H.at[i, j].add(jnp.einsum("nki,nkj->nij", Ji, WJj))
        H = H.at[j, i].add(jnp.einsum("nki,nkj->nij", Jj, WJi))
        b = b.at[i].add(jnp.einsum("nki,nk->ni", WJi, r))
        b = b.at[j].add(jnp.einsum("nki,nk->ni", WJj, r))
        return H, b

    H, b = add_factor(H, b, jnp.maximum(idx - 1, 0), idx, r_c, Ji_c, Jj_c,
                      w_c, info_c)
    H, b = add_factor(H, b, g.loop_i, g.loop_j, r_l, Ji_l, Jj_l, w_l,
                      jnp.ones(6, dtype))
    # prior: strong unary on node 0
    prior_info = info_c * w_p
    H = H.at[0, 0].add(jnp.diag(prior_info))
    b = b.at[0].add(prior_info * r_p)

    # inactive poses: identity blocks keep the system well-posed
    Hd = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
    act = jnp.repeat(active.astype(dtype), 6)
    Hd = Hd * (act[:, None] * act[None, :]) + jnp.diag(1.0 - act)
    Hd = Hd + damping * jnp.eye(N * 6, dtype=dtype)
    bd = b.reshape(-1) * act

    # Tiered solve: only the leading active prefix participates (inactive
    # rows are identity), so solve the smallest power-of-two prefix that
    # covers ``count``.  O(size^3) drops 64x while count <= N/4.  Note: a
    # pivoted dense LU is required here — sequential block elimination
    # (Thomas / cyclic reduction) loses ~1e0 relative accuracy in f32 on
    # these stiff chain Hessians (see ops/block_tridiag docstring).
    sizes = []
    s = 64
    while s < N:
        sizes.append(s)
        s *= 2
    sizes.append(N)

    def solve_at(size):
        def f(_):
            sub = -jnp.linalg.solve(Hd[: size * 6, : size * 6], bd[: size * 6])
            return jnp.concatenate([sub, jnp.zeros(N * 6 - size * 6, dtype)])
        return f

    if len(sizes) == 1:
        delta = solve_at(N)(None).reshape(N, 6)
    else:
        tier = sum(jnp.asarray(g.count > s, jnp.int32) for s in sizes[:-1])
        delta = jax.lax.switch(tier, [solve_at(s) for s in sizes],
                               None).reshape(N, 6)
    return delta, active


def optimize_dense(g: PoseGraph, chain_sigma, iters: int = 10,
                   loop_w_scale: float = 1.0, damping: float = 1e-6
                   ) -> PoseGraph:
    """GN with full O(N^2)-memory dense assembly — the simple oracle."""
    sigma = jnp.asarray(chain_sigma, g.poses.dtype)

    def body(_, g):
        delta, active = _assemble_and_solve(g, sigma, loop_w_scale, damping)
        upd = g.poses @ se3.se3_exp(delta)
        poses = jnp.where(active[:, None, None], upd, g.poses)
        return g._replace(poses=poses)

    return jax.lax.fori_loop(0, iters, body, g)


def optimize(g: PoseGraph, chain_sigma, iters: int = 10,
             loop_w_scale: float = 1.0, damping: float = 1e-6) -> PoseGraph:
    """Production GN: O(N) sparse assembly (tridiagonal + loop blocks), then
    a pivoted dense solve materialised only at the smallest power-of-two tier
    covering ``count``.  Same linear system as :func:`optimize_dense`; avoids
    both the [N,N,6,6] assembly traffic and the full-capacity O(N^3) solve.
    (Unpivoted O(N) solvers are NOT usable here — see :func:`optimize_fast`.)
    """
    N = g.poses.shape[0]
    Lf = g.loop_w.shape[0]
    dtype = g.poses.dtype
    sigma = jnp.asarray(chain_sigma, dtype)
    info_c = 1.0 / sigma

    sizes = []
    s = 64
    while s < N:
        sizes.append(s)
        s *= 2
    sizes.append(N)

    def gn_iter(g: PoseGraph) -> PoseGraph:
        idx = jnp.arange(N)
        active = idx < g.count

        # chain + prior (same math as optimize_fast's assembly)
        Xi = g.poses[jnp.maximum(idx - 1, 0)]
        Xj = g.poses
        r_c, Ji_c, Jj_c = _between_residual(Xi, Xj, g.chain_rel)
        w_c = (active & (idx > 0)).astype(dtype)
        WJi = Ji_c * (w_c[:, None, None] * info_c[None, :, None])
        WJj = Jj_c * (w_c[:, None, None] * info_c[None, :, None])

        D = jnp.zeros((N, 6, 6), dtype)
        Lo = jnp.zeros((N, 6, 6), dtype)
        Up = jnp.zeros((N, 6, 6), dtype)
        b = jnp.zeros((N, 6), dtype)
        i_prev = jnp.maximum(idx - 1, 0)
        D = D.at[i_prev].add(jnp.einsum("nki,nkj->nij", Ji_c, WJi))
        D = D.at[idx].add(jnp.einsum("nki,nkj->nij", Jj_c, WJj))
        Up = Up.at[i_prev].add(jnp.einsum("nki,nkj->nij", Ji_c, WJj))
        Lo = Lo.at[idx].add(jnp.einsum("nki,nkj->nij", Jj_c, WJi))
        b = b.at[i_prev].add(jnp.einsum("nki,nk->ni", WJi, r_c))
        b = b.at[idx].add(jnp.einsum("nki,nk->ni", WJj, r_c))

        w_p = (g.count > 0).astype(dtype)
        r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
        D = D.at[0].add(jnp.diag(info_c * w_p))
        b = b.at[0].add(info_c * w_p * r_p)

        # loop factors: diagonal terms fold into D, off-diagonals kept as
        # per-loop blocks for the tier scatter
        Xl_i = g.poses[g.loop_i]
        Xl_j = g.poses[g.loop_j]
        r_l, Ji_l, Jj_l = _between_residual(Xl_i, Xl_j, g.loop_rel)
        w_l = jnp.where(jnp.arange(Lf) < g.loop_count, g.loop_w, 0.0) \
            * loop_w_scale
        WJi_l = Ji_l * w_l[:, None, None]
        WJj_l = Jj_l * w_l[:, None, None]
        D = D.at[g.loop_i].add(jnp.einsum("lki,lkj->lij", Ji_l, WJi_l))
        D = D.at[g.loop_j].add(jnp.einsum("lki,lkj->lij", Jj_l, WJj_l))
        Hij = jnp.einsum("lki,lkj->lij", Ji_l, WJj_l)
        Hji = jnp.einsum("lki,lkj->lij", Jj_l, WJi_l)
        b = b.at[g.loop_i].add(jnp.einsum("lki,lk->li", WJi_l, r_l))
        b = b.at[g.loop_j].add(jnp.einsum("lki,lk->li", WJj_l, r_l))

        # masking: inactive nodes decouple to identity
        af = active.astype(dtype)[:, None, None]
        I6 = jnp.eye(6, dtype=dtype)
        D = D * af + (1.0 - af) * I6 + damping * I6
        Lo = Lo * af * jnp.concatenate(
            [jnp.zeros(1, dtype), active.astype(dtype)[:-1]])[:, None, None]
        Up = Up * af * jnp.concatenate(
            [active.astype(dtype)[1:], jnp.zeros(1, dtype)])[:, None, None]
        b = b * active.astype(dtype)[:, None]

        def solve_at(size):
            def f(_):
                ar = jnp.arange(size)
                H4 = jnp.zeros((size, size, 6, 6), dtype)
                H4 = H4.at[ar, ar].set(D[:size])
                H4 = H4.at[ar[:-1], ar[1:]].set(Up[: size - 1])
                H4 = H4.at[ar[1:], ar[:-1]].set(Lo[1:size])
                # loop endpoints always < count <= size
                li = jnp.clip(g.loop_i, 0, size - 1)
                lj = jnp.clip(g.loop_j, 0, size - 1)
                H4 = H4.at[li, lj].add(Hij)
                H4 = H4.at[lj, li].add(Hji)
                Hd = H4.transpose(0, 2, 1, 3).reshape(size * 6, size * 6)
                sub = -jnp.linalg.solve(Hd, b[:size].reshape(-1))
                return jnp.concatenate(
                    [sub, jnp.zeros((N - size) * 6, dtype)])
            return f

        if len(sizes) == 1:
            delta = solve_at(N)(None).reshape(N, 6)
        else:
            tier = sum(jnp.asarray(g.count > s_, jnp.int32)
                       for s_ in sizes[:-1])
            delta = jax.lax.switch(tier, [solve_at(s_) for s_ in sizes],
                                   None).reshape(N, 6)

        upd = g.poses @ se3.se3_exp(delta)
        poses = jnp.where(active[:, None, None], upd, g.poses)
        return g._replace(poses=poses)

    return jax.lax.fori_loop(0, iters, lambda _, g: gn_iter(g), g)


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def optimize_fast(g: PoseGraph, chain_sigma, iters: int = 3,
                  loop_w_scale: float = 1.0, damping: float = 1e-6) -> PoseGraph:
    """EXPERIMENTAL: GN with an O(N) structured solve (block-Thomas chain
    elimination + Woodbury loop term).  Mathematically exact and validated at
    small scale, but *unpivoted* sequential elimination loses ~1e0 relative
    accuracy in f32 over long stiff chains (N ~ 500), where pivoted dense LU
    keeps 1e-7 — use :func:`optimize` (tiered dense) in production until a
    compensated/mixed-precision sweep lands.

    Exactly the same linear system as :func:`optimize` — the chain Hessian is
    block-tridiagonal and each loop factor adds a rank-6 symmetric update
    ``A_l^T W_l A_l`` with ``A_l = [.. Ji .. Jj ..]``.
    """
    from ..ops.block_tridiag import block_thomas_solve

    N = g.poses.shape[0]
    Np = _next_pow2(N)
    Lf = g.loop_w.shape[0]
    dtype = g.poses.dtype
    sigma = jnp.asarray(chain_sigma, dtype)
    info_c = 1.0 / sigma

    def gn_iter(g: PoseGraph) -> PoseGraph:
        idx = jnp.arange(N)
        active = idx < g.count

        # ---- chain + prior: tridiagonal assembly ----
        Xi = g.poses[jnp.maximum(idx - 1, 0)]
        Xj = g.poses
        r_c, Ji_c, Jj_c = _between_residual(Xi, Xj, g.chain_rel)
        w_c = (active & (idx > 0)).astype(dtype)
        WJi = Ji_c * (w_c[:, None, None] * info_c[None, :, None])
        WJj = Jj_c * (w_c[:, None, None] * info_c[None, :, None])

        D = jnp.zeros((Np, 6, 6), dtype)
        Lo = jnp.zeros((Np, 6, 6), dtype)
        Up = jnp.zeros((Np, 6, 6), dtype)
        b = jnp.zeros((Np, 6), dtype)

        i_prev = jnp.maximum(idx - 1, 0)
        D = D.at[i_prev].add(jnp.einsum("nki,nkj->nij", Ji_c, WJi))
        D = D.at[idx].add(jnp.einsum("nki,nkj->nij", Jj_c, WJj))
        # factor i couples (i-1, i): U[i-1] and L[i]
        Up = Up.at[i_prev].add(jnp.einsum("nki,nkj->nij", Ji_c, WJj)
                               * w_c[:, None, None])
        Lo = Lo.at[idx].add(jnp.einsum("nki,nkj->nij", Jj_c, WJi)
                            * w_c[:, None, None])
        b = b.at[i_prev].add(jnp.einsum("nki,nk->ni", WJi, r_c))
        b = b.at[idx].add(jnp.einsum("nki,nk->ni", WJj, r_c))

        w_p = (g.count > 0).astype(dtype)
        r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
        D = D.at[0].add(jnp.diag(info_c * w_p))
        b = b.at[0].add(info_c * w_p * r_p)

        # inactive/padding nodes: identity diag, zero couplings/rhs
        act_p = jnp.concatenate([active, jnp.zeros(Np - N, bool)])
        af = act_p.astype(dtype)[:, None, None]
        I6 = jnp.eye(6, dtype=dtype)
        D = D * af + (1.0 - af) * I6 + damping * I6
        Lo = Lo * af * jnp.concatenate(
            [jnp.zeros(1, dtype), act_p.astype(dtype)[:-1]])[:, None, None]
        Up = Up * af * jnp.concatenate(
            [act_p.astype(dtype)[1:], jnp.zeros(1, dtype)])[:, None, None]
        b = b * act_p.astype(dtype)[:, None]

        # ---- loop factors: gradient + low-rank Woodbury blocks ----
        Xl_i = g.poses[g.loop_i]
        Xl_j = g.poses[g.loop_j]
        r_l, Ji_l, Jj_l = _between_residual(Xl_i, Xl_j, g.loop_rel)
        l_act = (jnp.arange(Lf) < g.loop_count)
        w_l = jnp.where(l_act, g.loop_w, 0.0) * loop_w_scale

        b = b.at[g.loop_i].add(
            jnp.einsum("lki,lk->li", Ji_l, r_l) * w_l[:, None])
        b = b.at[g.loop_j].add(
            jnp.einsum("lki,lk->li", Jj_l, r_l) * w_l[:, None])

        # V [Np, 6, 6L]: V[i_l, :, l] = Ji_l^T, V[j_l, :, l] = Jj_l^T,
        # masked by loop activity (weights enter through W)
        lw = l_act.astype(dtype)[:, None, None]
        V = jnp.zeros((Np, 6, Lf, 6), dtype)
        V = V.at[g.loop_i, :, jnp.arange(Lf), :].add(
            jnp.swapaxes(Ji_l, 1, 2) * lw)
        V = V.at[g.loop_j, :, jnp.arange(Lf), :].add(
            jnp.swapaxes(Jj_l, 1, 2) * lw)
        V = V.reshape(Np, 6, Lf * 6)

        # ---- solve (T + V W V^T) delta = -b via Woodbury ----
        B_all = jnp.concatenate([-b[:, :, None], V], axis=2)   # [Np,6,1+6L]
        Y = block_thomas_solve(D, Lo, Up, B_all)
        y = Y[:, :, 0]
        Z = Y[:, :, 1:]

        VtZ = jnp.einsum("nik,nil->kl", V, Z)                  # [6L, 6L]
        Vty = jnp.einsum("nik,ni->k", V, y)
        w_rep = jnp.repeat(jnp.maximum(w_l, 1e-12), 6)
        core = jnp.diag(1.0 / w_rep) + VtZ
        corr = Z @ jnp.linalg.solve(core, Vty)
        delta = (y - corr)[:N]

        upd = g.poses @ se3.se3_exp(delta)
        poses = jnp.where(active[:, None, None], upd, g.poses)
        return g._replace(poses=poses)

    return jax.lax.fori_loop(0, iters, lambda _, g: gn_iter(g), g)
