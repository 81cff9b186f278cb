"""Block-tridiagonal solver via cyclic reduction (TPU-parallel Thomas).

The pose-graph Hessian is block-tridiagonal (chain factors) plus a low-rank
loop term.  A dense 6N x 6N solve costs O(N^3) and dominated loop-closure
time; cyclic reduction eliminates odd-indexed blocks in parallel at each of
log2(N) levels — every level is a batch of 6x6 matmuls/inverses, exactly the
shape TPUs like.  Loop factors are folded in by the Woodbury identity in
models/pose_graph.

System: D_i x_i + L_i x_{i-1} + U_i x_{i+1} = b_i  (L_0 = U_{N-1} = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv6(A):
    """Batched 6x6 inverse via solve against identity."""
    I = jnp.broadcast_to(jnp.eye(6, dtype=A.dtype), A.shape)
    return jnp.linalg.solve(A, I)


def block_thomas_solve(D, L, U, B):
    """Sequential block-Thomas solve (backward-stable for SPD systems).

    Cyclic reduction (below) is O(log N) parallel steps but numerically
    unstable on stiff pose-graph chains (not diagonally dominant: off-diagonal
    blocks rival the diagonal); Thomas is sequential but stable, and under
    ``lax.scan`` each 6x6 step costs microseconds — still ~50x cheaper than
    the dense O(N^3) solve at N=512.

    D [N,6,6], L [N,6,6] (sub, L[0] ignored), U [N,6,6] (super, U[N-1]
    ignored), B [N,6,K] -> X [N,6,K].
    """
    N = D.shape[0]

    def fwd(carry, inp):
        Cp, Bp = carry                       # C'_{i-1} [6,6], B'_{i-1} [6,K]
        Di, Li, Ui, bi = inp
        denom = Di - Li @ Cp
        sol = jnp.linalg.solve(denom, jnp.concatenate([Ui, bi - Li @ Bp], 1))
        Ci = sol[:, :6]
        Bi = sol[:, 6:]
        return (Ci, Bi), (Ci, Bi)

    K = B.shape[-1]
    init = (jnp.zeros((6, 6), D.dtype), jnp.zeros((6, K), D.dtype))
    _, (C, Bp) = jax.lax.scan(fwd, init, (D, L, U, B))

    def bwd(x_next, inp):
        Ci, Bi = inp
        xi = Bi - Ci @ x_next
        return xi, xi

    _, X = jax.lax.scan(bwd, jnp.zeros((6, K), D.dtype), (C, Bp), reverse=True)
    return X


def block_tridiag_solve(D, L, U, B):
    """Solve the block-tridiagonal system for [N, 6, K] right-hand sides.

    D [N,6,6] diagonal, L [N,6,6] sub-diagonal (L[0] ignored), U [N,6,6]
    super-diagonal (U[N-1] ignored), B [N,6,K].  N must be a power of two
    (pad with identity blocks / zero couplings).
    """
    N = D.shape[0]
    assert N & (N - 1) == 0, "pad N to a power of two"

    levels = []
    while D.shape[0] > 1:
        n = D.shape[0]
        Dinv_odd = _inv6(D[1::2])                      # [n/2, 6, 6]
        levels.append((D, L, U, B, Dinv_odd))

        L_odd, U_odd, B_odd = L[1::2], U[1::2], B[1::2]
        De, Le, Ue, Be = D[0::2], L[0::2], U[0::2], B[0::2]

        # even 2t couples to odd 2t-1 (via Le) and odd 2t+1 (via Ue);
        # eliminate both using the odd equations
        m = n // 2
        A_hi = jnp.einsum("tij,tjk->tik", Ue, Dinv_odd)        # Ue[t] Dinv[t]
        A_lo = (jnp.einsum("tij,tjk->tik", Le[1:], Dinv_odd[: m - 1])
                if m > 1 else jnp.zeros((0, 6, 6), D.dtype))   # Le[t] Dinv[t-1]
        nD = De
        nL = jnp.zeros_like(De)
        nU = jnp.zeros_like(De)
        nB = Be

        # contribution from x_{2t+1}: A_hi[t] * (B_odd[t] - L_odd[t] x_{2t}
        #                                        - U_odd[t] x_{2t+2})
        nD = nD - jnp.einsum("tij,tjk->tik", A_hi, L_odd)
        nB = nB - jnp.einsum("tij,tjk->tik", A_hi, B_odd)
        nU = nU.at[: m - 1].add(
            -jnp.einsum("tij,tjk->tik", A_hi[: m - 1], U_odd[: m - 1]))

        # contribution from x_{2t-1} (t >= 1): A_lo[t-1] * (B_odd[t-1]
        #        - L_odd[t-1] x_{2t-2} - U_odd[t-1] x_{2t})
        nD = nD.at[1:].add(-jnp.einsum("tij,tjk->tik", A_lo, U_odd[: m - 1]))
        nB = nB.at[1:].add(-jnp.einsum("tij,tjk->tik", A_lo, B_odd[: m - 1]))
        nL = nL.at[1:].add(-jnp.einsum("tij,tjk->tik", A_lo, L_odd[: m - 1]))

        D, L, U, B = nD, nL, nU, nB

    x = jnp.linalg.solve(D[0], B[0])[None]             # [1, 6, K]

    for (Dl, Ll, Ul, Bl, Dinv_odd) in reversed(levels):
        n = Dl.shape[0]
        m = n // 2
        x_even = x                                      # [m(+1?), 6, K]
        # x_odd[t] = Dinv_odd[t] (B_odd[t] - L_odd[t] x_even[t]
        #                                   - U_odd[t] x_even[t+1])
        rhs = Bl[1::2] - jnp.einsum("tij,tjk->tik", Ll[1::2], x_even[:m])
        has_up = x_even.shape[0] > 1
        up = jnp.concatenate([x_even[1:],
                              jnp.zeros((m - (x_even.shape[0] - 1), 6,
                                         x.shape[-1]), x.dtype)], 0) \
            if has_up else jnp.zeros((m, 6, x.shape[-1]), x.dtype)
        rhs = rhs - jnp.einsum("tij,tjk->tik", Ul[1::2], up)
        x_odd = jnp.einsum("tij,tjk->tik", Dinv_odd, rhs)

        out = jnp.zeros((n, 6, x.shape[-1]), x.dtype)
        out = out.at[0::2].set(x_even)
        out = out.at[1::2].set(x_odd)
        x = out
    return x
