"""SE(3) pose-graph optimisation (T4 — the GTSAM/iSAM2 replacement).

The reference maintains a gtsam ``ISAM2`` with a prior on pose 0, odometry
``BetweenFactor``s along the keyframe chain, and loop-closure between factors
(``/root/reference/src/LM.cpp:197-204, 636-704, 878-882``).  The TPU-native
design is batched Gauss-Newton over the whole graph: the factor set is three
fixed-shape arrays (prior, chain, loops), the residual is the
right-trivialised ``Log(Z^-1 Xi^-1 Xj)``, and Jacobians use the standard
adjoint closed forms with the small-residual ``Jr^-1 ~ I + ad(r)/2``
approximation.

Production solve (:func:`optimize`): the chain+prior normal matrix is exactly
``J^T Info J`` with ``J`` square block-bidiagonal, so its inverse is applied
by two associative-scan triangular solves without ever forming the Hessian
(``ops/chain_solver`` — O(N) work, O(log N) depth, f32-stable); the L loop
factors fold in via the matrix inversion lemma with a 6L x 6L core solve.
:func:`optimize_dense` keeps the dense-assembly pivoted-LU formulation as the
test oracle.

Incremental behaviour mimicking iSAM2's relinearisation policy: between loop
closures the chain is exact (each new keyframe pose is the composed estimate),
so the full solve runs only when a loop factor arrives — matching where the
reference actually spends iSAM2 work (update x2 on loop, LM.cpp:880-881).

Capacity policy: the reference grows its keyframe vectors unboundedly
(LM.cpp:67-69, 699-701).  Here the graph has a static capacity; when full,
:func:`add_keyframe` REJECTS the new keyframe and counts it in ``overflow``
(never corrupting the chain), and the host driver surfaces the condition
(models/pipeline.SlamPipeline).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.chain_solver import chain_solve


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
    overflow:   scalar int32 keyframes rejected at capacity
    loop_overflow: scalar int32 loop factors rejected at capacity
    """

    poses: jnp.ndarray
    chain_rel: jnp.ndarray
    loop_i: jnp.ndarray
    loop_j: jnp.ndarray
    loop_rel: jnp.ndarray
    loop_w: jnp.ndarray
    count: jnp.ndarray
    loop_count: jnp.ndarray
    overflow: jnp.ndarray
    loop_overflow: jnp.ndarray


def init_graph(max_kf: int, max_loops: int, dtype=jnp.float32) -> PoseGraph:
    def eye_stack():
        # materialised per-field: sharing ONE array object between two pytree
        # leaves breaks buffer donation (same buffer donated twice)
        return jnp.tile(jnp.eye(4, dtype=dtype), (max_kf, 1, 1))

    return PoseGraph(
        poses=eye_stack(), chain_rel=eye_stack(),
        loop_i=jnp.zeros(max_loops, jnp.int32),
        loop_j=jnp.zeros(max_loops, jnp.int32),
        loop_rel=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_loops, 4, 4)),
        loop_w=jnp.zeros(max_loops, dtype),
        count=jnp.int32(0), loop_count=jnp.int32(0),
        overflow=jnp.int32(0), loop_overflow=jnp.int32(0),
    )


def add_keyframe(g: PoseGraph, pose: jnp.ndarray, do=None) -> PoseGraph:
    """Append a pose; measured between = prev^-1 @ pose (LM.cpp:655-658).

    At capacity the keyframe is REJECTED and counted in ``overflow`` — the
    stored chain stays consistent (round-1's silent newest-slot overwrite
    rewrote chain_rel against a stale predecessor).

    ``do``: optional traced bool — when False the call is a value-level
    no-op (the existing row is written back to itself).  Callers gate the
    save HERE instead of wrapping the call in ``lax.cond``: the gate is a
    per-ROW select, so every buffer stays a pure dynamic-update-slice XLA
    can alias in place, where a cond whose true branch selects between the
    original and an updated full buffer forces a materialised copy."""
    cap = g.poses.shape[0]
    if do is None:
        do = jnp.bool_(True)
    at_cap = g.count >= cap
    write = do & ~at_cap
    k = jnp.minimum(g.count, cap - 1)
    prev = g.poses[jnp.maximum(k - 1, 0)]
    rel = jnp.where(k == 0, pose, se3.inv_mat(prev) @ pose)
    return g._replace(
        poses=g.poses.at[k].set(jnp.where(write, pose, g.poses[k])),
        chain_rel=g.chain_rel.at[k].set(jnp.where(write, rel,
                                                  g.chain_rel[k])),
        count=g.count + write.astype(jnp.int32),
        overflow=g.overflow + (do & at_cap).astype(jnp.int32),
    )


def add_loop_factor(g: PoseGraph, i, j, rel, weight) -> PoseGraph:
    """Append a loop factor.  At capacity the factor is REJECTED and
    counted in ``loop_overflow`` — overwriting the newest slot would
    silently destroy an accepted constraint (same policy as
    :func:`add_keyframe`)."""
    cap = g.loop_w.shape[0]
    at_cap = g.loop_count >= cap
    l = jnp.minimum(g.loop_count, cap - 1)

    def put(a, v):
        return jnp.where(at_cap, a, a.at[l].set(v))

    return g._replace(
        loop_i=put(g.loop_i, i.astype(jnp.int32)),
        loop_j=put(g.loop_j, j.astype(jnp.int32)),
        loop_rel=put(g.loop_rel, rel),
        loop_w=put(g.loop_w, weight),
        loop_count=jnp.where(at_cap, g.loop_count, g.loop_count + 1),
        loop_overflow=g.loop_overflow + at_cap.astype(jnp.int32),
    )


def _between_parts(Xi, Xj, Z):
    """r = Log(Z^-1 Xi^-1 Xj) plus the factor blocks:
    Jj = Jr_inv, Ji = -Jr_inv @ Ad with Ad = Adj(Xj^-1 Xi)."""
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
    Ad = se3.adjoint(se3.inv_mat(Xj) @ Xi)
    return r, Jr_inv, Ad


def _between_residual(Xi, Xj, Z):
    """r and the (Ji, Jj) Jacobians wrt right-perturbations of i, j."""
    r, Jr_inv, Ad = _between_parts(Xi, Xj, Z)
    return r, -Jr_inv @ Ad, Jr_inv


def _assemble_and_solve(g: PoseGraph, chain_sigma, loop_w_scale, damping):
    """One GN iteration: dense H delta = -b over 6*N dofs (oracle path)."""
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

    delta = -jnp.linalg.solve(Hd, bd).reshape(N, 6)
    return delta, active


def optimize_dense(g: PoseGraph, chain_sigma, iters: int = 10,
                   loop_w_scale: float = 1.0, damping: float = 0.0
                   ) -> PoseGraph:
    """GN with full O(N^2)-memory dense assembly — the simple oracle."""
    sigma = jnp.asarray(chain_sigma, g.poses.dtype)

    def body(_, g):
        delta, active = _assemble_and_solve(g, sigma, loop_w_scale, damping)
        upd = g.poses @ se3.se3_exp(delta)
        poses = jnp.where(active[:, None, None], upd, g.poses)
        return g._replace(poses=poses)

    return jax.lax.fori_loop(0, iters, body, g)


# Shared production-solver defaults: parallel/schur.py's distributed variant
# must converge identically to this single-device path, so both read these.
DEFAULT_MAX_STEP = 1.0
DEFAULT_LOOP_W_SCALE = 1.0


def optimize(g: PoseGraph, chain_sigma, iters: int = 3,
             loop_w_scale: float = DEFAULT_LOOP_W_SCALE,
             max_step: float = DEFAULT_MAX_STEP,
             f64: bool = True) -> PoseGraph:
    """Production GN: factored O(N) chain solve + low-rank loop fold-in.

    Identical linear system to :func:`optimize_dense` (at damping 0): the
    chain+prior normal matrix ``T = J^T Info J`` is inverted in factored form
    (ops/chain_solver — two associative scans, never forming T, f32-stable at
    N >= 2048), and the ``L`` loop factors enter as ``Vs Vs^T`` through the
    matrix inversion lemma:

        delta = -(T + Vs Vs^T)^{-1} b
              = -(T^{-1} b) + T^{-1} Vs (I + Vs^T T^{-1} Vs)^{-1} Vs^T T^{-1} b

    with ``Vs`` the sqrt-weighted loop Jacobian columns — one chain solve over
    1 + 6L right-hand sides plus a 6L x 6L pivoted core solve.

    ``f64=True`` (default) assembles the GN system in f64 and recovers f64
    solution accuracy by MIXED-PRECISION ITERATIVE REFINEMENT: the factored
    solve runs in f32 (cheap, MXU-shaped), then one f64 residual
    ``res = -b - (T + Vs Vs^T) delta`` — O(N) bidiagonal matvecs, no f64
    scan — and an f32 re-solve of the correction.  Chain compliance
    amplifies per-link rounding ~1e5x at N = 2048, where plain f32 left a
    contraction-order-sensitive 0.09-0.39 m self-consistency wobble
    (round-2 dryrun canary); a fully-f64 factored solve fixed it but
    tripled compile time (441 s vs 140 s measured — the f64 associative
    scan over the 1+6L rhs block dominates), while refinement gets the same
    accuracy for two extra matvecs.  Cost is paid only on loop events.
    """

    def gn_iter(g: PoseGraph) -> PoseGraph:
        dtype = g.poses.dtype
        if f64:
            with jax.enable_x64(True):
                g64 = g._replace(
                    poses=g.poses.astype(jnp.float64),
                    chain_rel=g.chain_rel.astype(jnp.float64),
                    loop_rel=g.loop_rel.astype(jnp.float64),
                    loop_w=g.loop_w.astype(jnp.float64))
                sigma = jnp.asarray(chain_sigma, jnp.float64)
                Ad, Jr, info, b, Vs = _gn_parts(g64, sigma, loop_w_scale)
                f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
                Ad32, Jr32, info32, Vs32 = (f32(Ad), f32(Jr), f32(info),
                                            f32(Vs))
                # the expensive T^{-1} Vs block (K = 6L columns) is shared
                # between the initial solve and the refinement correction;
                # each refinement step then costs only a K=1 chain solve
                Z = chain_solve(Ad32, Jr32, info32, Vs32)
                K = Vs32.shape[-1]
                core = (jnp.eye(K, dtype=jnp.float32)
                        + jnp.einsum("nik,nil->kl", Vs32, Z))

                def solve32(b_):
                    y = chain_solve(Ad32, Jr32, info32,
                                    -b_[:, :, None])[:, :, 0]
                    Vty = jnp.einsum("nik,ni->k", Vs32, y)
                    return y - Z @ jnp.linalg.solve(core, Vty)

                delta = solve32(f32(b)).astype(jnp.float64)
                res = -b - _apply_system(Ad, Jr, info, Vs, delta)
                delta = delta + solve32(-f32(res)).astype(jnp.float64)
            delta = delta.astype(dtype)
        else:
            sigma = jnp.asarray(chain_sigma, dtype)
            Ad, Jr, info, b, Vs = _gn_parts(g, sigma, loop_w_scale)
            delta = _factored_delta(Ad, Jr, info, b, Vs)
        # trust region: a global scale keeping every node's step <= max_step
        # (GTSAM's iSAM2 wraps GN in Dogleg for the same reason; a raw GN
        # step can diverge when loop factors are strongly inconsistent)
        step = jnp.max(jnp.abs(delta))
        delta = delta * jnp.minimum(1.0, max_step / jnp.maximum(step, 1e-12))
        active = jnp.arange(g.poses.shape[0]) < g.count
        upd = g.poses @ se3.se3_exp(delta)
        poses = jnp.where(active[:, None, None], upd, g.poses)
        return g._replace(poses=poses)

    return jax.lax.fori_loop(0, iters, lambda _, g: gn_iter(g), g)


def graph_energy(g: PoseGraph, chain_sigma,
                 loop_w_scale: float = DEFAULT_LOOP_W_SCALE) -> jnp.ndarray:
    """Total weighted squared residual of chain + prior + loop factors —
    the objective `optimize` minimizes; used to pick between candidate
    solutions (laser_mapping solves each accepted loop from TWO
    initializations and keeps the lower-energy result)."""
    dtype = g.poses.dtype
    N = g.poses.shape[0]
    idx = jnp.arange(N)
    active = idx < g.count
    info = 1.0 / jnp.asarray(chain_sigma, dtype)

    Xi = g.poses[jnp.maximum(idx - 1, 0)]
    r_c = jax.vmap(lambda a, b, z: se3.se3_log(
        se3.inv_mat(z) @ se3.inv_mat(a) @ b))(Xi, g.poses, g.chain_rel)
    w_c = (active & (idx > 0)).astype(dtype)
    e = jnp.sum(w_c[:, None] * r_c * r_c * info[None, :])

    r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
    e = e + (g.count > 0) * jnp.sum(r_p * r_p * info)

    r_l = jax.vmap(lambda i, j, z: se3.se3_log(
        se3.inv_mat(z) @ se3.inv_mat(g.poses[i]) @ g.poses[j]))(
        g.loop_i, g.loop_j, g.loop_rel)
    l_idx = jnp.arange(g.loop_w.shape[0])
    w_l = jnp.where(l_idx < g.loop_count, g.loop_w, 0.0) * loop_w_scale
    return e + jnp.sum(w_l[:, None] * r_l * r_l)


def _gn_parts(g: PoseGraph, sigma: jnp.ndarray, loop_w_scale: float):
    """Assemble one GN iteration's factored system parts.

    Returns (Ad, Jr, info, b, Vs): the chain+prior normal matrix is
    ``T = J^T diag(info) J`` with ``J`` block-bidiagonal from (Ad, Jr);
    ``b`` is the full gradient ``J_all^T W r`` including loops; ``Vs`` the
    sqrt-weighted loop columns so the loop Hessian term is ``Vs Vs^T``.
    """
    N = g.poses.shape[0]
    Lf = g.loop_w.shape[0]
    dtype = g.poses.dtype
    info_c = 1.0 / sigma
    I6 = jnp.eye(6, dtype=dtype)
    idx = jnp.arange(N)
    active = idx < g.count

    # ---- chain rows i = 1..count-1 ----
    Xi = g.poses[jnp.maximum(idx - 1, 0)]
    Xj = g.poses
    r_c, Jr_c, Ad_c = _between_parts(Xi, Xj, g.chain_rel)
    row_chain = active & (idx > 0)
    rc = row_chain.astype(dtype)[:, None, None]

    # factored-row data: prior at row 0 (Jr = I, Ad = 0); identity rows
    # (Jr = I, Ad = 0, info = 1) decouple the inactive suffix
    Ad = Ad_c * rc
    Jr = jnp.where(row_chain[:, None, None], Jr_c, I6)
    w_p = (g.count > 0).astype(dtype)
    info_row0 = jnp.where(g.count > 0, info_c, jnp.ones(6, dtype))
    info = jnp.where(row_chain[:, None], info_c[None, :],
                     jnp.ones((1, 6), dtype))
    info = info.at[0].set(info_row0)

    # ---- gradient b = J^T Info r over all factors ----
    Ji_c = -Jr_c @ Ad_c
    w_c = row_chain.astype(dtype)
    WJi = Ji_c * (w_c[:, None, None] * info_c[None, :, None])
    WJj = Jr_c * (w_c[:, None, None] * info_c[None, :, None])
    b = jnp.zeros((N, 6), dtype)
    b = b.at[jnp.maximum(idx - 1, 0)].add(
        jnp.einsum("nki,nk->ni", WJi, r_c))
    b = b.at[idx].add(jnp.einsum("nki,nk->ni", WJj, r_c))
    r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
    b = b.at[0].add(info_c * w_p * r_p)

    # ---- loop factors: gradient + sqrt-weighted low-rank columns ----
    Xl_i = g.poses[g.loop_i]
    Xl_j = g.poses[g.loop_j]
    r_l, Jr_l, Ad_l = _between_parts(Xl_i, Xl_j, g.loop_rel)
    Ji_l = -Jr_l @ Ad_l
    Jj_l = Jr_l
    l_act = jnp.arange(Lf) < g.loop_count
    w_l = jnp.where(l_act, g.loop_w, 0.0) * loop_w_scale
    b = b.at[g.loop_i].add(
        jnp.einsum("lki,lk->li", Ji_l, r_l) * w_l[:, None])
    b = b.at[g.loop_j].add(
        jnp.einsum("lki,lk->li", Jj_l, r_l) * w_l[:, None])

    sw = jnp.sqrt(w_l)[:, None, None]
    Vs = jnp.zeros((N, 6, Lf, 6), dtype)
    Vs = Vs.at[g.loop_i, :, jnp.arange(Lf), :].add(
        jnp.swapaxes(Ji_l, 1, 2) * sw)
    Vs = Vs.at[g.loop_j, :, jnp.arange(Lf), :].add(
        jnp.swapaxes(Jj_l, 1, 2) * sw)
    Vs = Vs.reshape(N, 6, Lf * 6)
    return Ad, Jr, info, b, Vs


def _apply_system(Ad, Jr, info, Vs, d):
    """(T + Vs Vs^T) d with T = (Dg B)^T Info (Dg B) applied in factored
    form: two bidiagonal shifts + diagonal scales + the low-rank term —
    O(N) small matmuls, runs in the dtype of its inputs (used for the f64
    refinement residual)."""
    # B d: (B d)_i = d_i - Ad_i d_{i-1}   (Ad[0] = 0 covers the prior row)
    d_prev = jnp.concatenate([jnp.zeros_like(d[:1]), d[:-1]], 0)
    Bd = d - jnp.einsum("nij,nj->ni", Ad, d_prev)
    Jd = jnp.einsum("nij,nj->ni", Jr, Bd)
    r1 = info * Jd
    # Dg^T r1 then B^T y: (B^T y)_i = y_i - Ad_{i+1}^T y_{i+1}
    y = jnp.einsum("nji,nj->ni", Jr, r1)
    y_next = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], 0)
    Ad_next = jnp.concatenate([Ad[1:], jnp.zeros_like(Ad[:1])], 0)
    Td = y - jnp.einsum("nji,nj->ni", Ad_next, y_next)
    Vtd = jnp.einsum("nik,ni->k", Vs, d)
    return Td + jnp.einsum("nik,k->ni", Vs, Vtd)


def _factored_delta(Ad, Jr, info, b, Vs):
    """delta = -(T + Vs Vs^T)^{-1} b via one batched chain solve + the
    matrix inversion lemma's 6L x 6L pivoted core solve."""
    Y = chain_solve(Ad, Jr, info, jnp.concatenate(
        [-b[:, :, None], Vs], axis=2))
    y = Y[:, :, 0]                                  # T^{-1} (-b)
    Z = Y[:, :, 1:]                                 # T^{-1} Vs
    K = Vs.shape[-1]
    core = jnp.eye(K, dtype=Vs.dtype) + jnp.einsum("nik,nil->kl", Vs, Z)
    Vty = jnp.einsum("nik,ni->k", Vs, y)
    if Vs.dtype == jnp.float32:
        cv = jnp.linalg.solve(core, Vty)
    else:            # f64 LU doesn't lower on TPU: f32 LU + refinement
        from ..ops.chain_solver import solve_small_refined
        cv = solve_small_refined(core, Vty)
    return y - Z @ cv
