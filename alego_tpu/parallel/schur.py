"""Distributed pose-graph solve via Schur-complement reduction (BASELINE
north star: "distributed pose-graph / bundle-adjustment optimization via
Schur-complement reduction over ICI collectives").

The keyframe chain is partitioned into contiguous blocks, one per device.
Separator set = block-boundary poses + loop-closure endpoints (prior node 0
included).  Chain edges only link adjacent poses and loop edges only link
separators, so the interior Hessian is block-diagonal across devices: each
device factors its interior locally (the cubic work scales ~1/n^3 per
device), its Schur contribution to the separator system is ``psum``-reduced
over the mesh (ICI), the small separator solve is replicated, and interior
back-substitution is local again.  Exact: matches the dense solve.

System per GN step: H d = -b, with
  d_s = -(H_ss - sum_d H_si^d (H_ii^d)^-1 H_is^d)^-1 (b_s - sum_d H_si^d (H_ii^d)^-1 b_i^d)
  d_i^d = -(H_ii^d)^-1 (b_i^d + H_is^d d_s)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import se3
from ..models import pose_graph as pg


def assemble_dense(g: pg.PoseGraph, chain_sigma, loop_w_scale=1.0,
                   damping: float = 1e-6):
    """Dense H [N*6, N*6], b [N*6] at the current linearisation point
    (same factors as models/pose_graph: prior + chain + loops)."""
    N = g.poses.shape[0]
    dtype = g.poses.dtype
    idx = jnp.arange(N)
    active = idx < g.count

    Xi = g.poses[jnp.maximum(idx - 1, 0)]
    Xj = g.poses
    r_c, Ji_c, Jj_c = pg._between_residual(Xi, Xj, g.chain_rel)
    w_c = (active & (idx > 0)).astype(dtype)
    info_c = 1.0 / jnp.asarray(chain_sigma, dtype)

    r_p = se3.se3_log(se3.inv_mat(g.chain_rel[0]) @ g.poses[0])
    w_p = (g.count > 0).astype(dtype)

    Xl_i = g.poses[g.loop_i]
    Xl_j = g.poses[g.loop_j]
    r_l, Ji_l, Jj_l = pg._between_residual(Xl_i, Xl_j, g.loop_rel)
    l_idx = jnp.arange(g.loop_w.shape[0])
    w_l = jnp.where(l_idx < g.loop_count, g.loop_w, 0.0) * loop_w_scale

    H = jnp.zeros((N, N, 6, 6), dtype)
    b = jnp.zeros((N, 6), dtype)

    def add(H, b, i, j, r, Ji, Jj, w, info):
        WJi = Ji * (w[..., None, None] * info[None, :, None])
        WJj = Jj * (w[..., None, None] * info[None, :, None])
        H = H.at[i, i].add(jnp.einsum("nki,nkj->nij", Ji, WJi))
        H = H.at[j, j].add(jnp.einsum("nki,nkj->nij", Jj, WJj))
        H = H.at[i, j].add(jnp.einsum("nki,nkj->nij", Ji, WJj))
        H = H.at[j, i].add(jnp.einsum("nki,nkj->nij", Jj, WJi))
        b = b.at[i].add(jnp.einsum("nki,nk->ni", WJi, r))
        b = b.at[j].add(jnp.einsum("nki,nk->ni", WJj, r))
        return H, b

    H, b = add(H, b, jnp.maximum(idx - 1, 0), idx, r_c, Ji_c, Jj_c, w_c, info_c)
    H, b = add(H, b, g.loop_i, g.loop_j, r_l, Ji_l, Jj_l, w_l, jnp.ones(6, dtype))
    H = H.at[0, 0].add(jnp.diag(info_c * w_p))
    b = b.at[0].add(info_c * w_p * r_p)

    Hd = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
    act = jnp.repeat(active.astype(dtype), 6)
    Hd = Hd * (act[:, None] * act[None, :]) + jnp.diag(1.0 - act)
    Hd = Hd + damping * jnp.eye(N * 6, dtype=dtype)
    bd = b.reshape(-1) * act
    return Hd, bd


def separator_mask(N: int, n_blocks: int, loop_i, loop_j, loop_count):
    """Bool [N]: block boundaries + loop endpoints + node 0."""
    blk = N // n_blocks
    idx = jnp.arange(N)
    sep = (idx % blk == 0) | (idx % blk == blk - 1) | (idx == 0)
    L = loop_i.shape[0]
    lmask = jnp.arange(L) < loop_count
    sep = sep.at[jnp.where(lmask, loop_i, 0)].set(True)
    sep = sep.at[jnp.where(lmask, loop_j, 0)].set(True)
    return sep


def make_schur_solver(mesh: Mesh, N: int, chain_sigma, iters: int = 5,
                      axis: str = "data", damping: float = 1e-6):
    """jitted fn(PoseGraph) -> PoseGraph via distributed Schur GN."""
    n_dev = mesh.shape[axis]
    assert N % n_dev == 0
    blk6 = (N // n_dev) * 6
    sigma = jnp.asarray(chain_sigma, jnp.float32)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=(P(), P()))
    def schur_terms(Hd, bd, sep6f):
        d = jax.lax.axis_index(axis)
        lo = d * blk6
        Hblk = jax.lax.dynamic_slice(Hd, (lo, 0), (blk6, Hd.shape[1]))
        bblk = jax.lax.dynamic_slice(bd, (lo,), (blk6,))
        i_mask = 1.0 - jax.lax.dynamic_slice(sep6f, (lo,), (blk6,))

        Hii = jax.lax.dynamic_slice(Hblk, (0, lo), (blk6, blk6))
        Hii = Hii * (i_mask[:, None] * i_mask[None, :]) + jnp.diag(1.0 - i_mask)
        His = Hblk * (i_mask[:, None] * sep6f[None, :])
        bi = bblk * i_mask

        Y = jnp.linalg.solve(Hii, jnp.concatenate([His, bi[:, None]], 1))
        Yh, yb = Y[:, :-1], Y[:, -1]
        C = His.T @ Yh             # H_si (H_ii)^-1 H_is  (sep x sep support)
        c = His.T @ yb
        return jax.lax.psum(C, axis), jax.lax.psum(c, axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()),
             out_specs=P())
    def interior_delta(Hd, bd, sep6f, delta_s):
        d = jax.lax.axis_index(axis)
        lo = d * blk6
        Hblk = jax.lax.dynamic_slice(Hd, (lo, 0), (blk6, Hd.shape[1]))
        bblk = jax.lax.dynamic_slice(bd, (lo,), (blk6,))
        i_mask = 1.0 - jax.lax.dynamic_slice(sep6f, (lo,), (blk6,))
        Hii = jax.lax.dynamic_slice(Hblk, (0, lo), (blk6, blk6))
        Hii = Hii * (i_mask[:, None] * i_mask[None, :]) + jnp.diag(1.0 - i_mask)
        His = Hblk * (i_mask[:, None] * sep6f[None, :])
        bi = bblk * i_mask
        di = -jnp.linalg.solve(Hii, bi + His @ delta_s) * i_mask
        full = jnp.zeros_like(bd)
        full = jax.lax.dynamic_update_slice(full, di, (lo,))
        return jax.lax.psum(full, axis)

    def gn_iter(g: pg.PoseGraph) -> pg.PoseGraph:
        Hd, bd = assemble_dense(g, sigma, damping=damping)
        sep = separator_mask(N, n_dev, g.loop_i, g.loop_j, g.loop_count)
        sep6f = jnp.repeat(sep, 6).astype(Hd.dtype)

        C, c = schur_terms(Hd, bd, sep6f)
        S = (Hd - C) * (sep6f[:, None] * sep6f[None, :]) + jnp.diag(1.0 - sep6f)
        rhs = (bd - c) * sep6f
        delta_s = -jnp.linalg.solve(S, rhs) * sep6f

        delta_i = interior_delta(Hd, bd, sep6f, delta_s)
        delta = delta_s + delta_i

        upd = g.poses @ se3.se3_exp(delta.reshape(N, 6))
        active = jnp.arange(N) < g.count
        return g._replace(poses=jnp.where(active[:, None, None], upd, g.poses))

    @jax.jit
    def solve(g: pg.PoseGraph) -> pg.PoseGraph:
        return jax.lax.fori_loop(0, iters, lambda _, g: gn_iter(g), g)

    return solve
