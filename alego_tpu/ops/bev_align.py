"""Coarse loop-closure alignment by bird's-eye-view correlation.

The reference verifies loop candidates with point-to-point ICP started from
IDENTITY in the map frame (``/root/reference/src/LM.cpp:828-836``).  That
basin is a couple of metres / tens of degrees wide; real revisit drift — the
regime loop closure exists for — exceeds it (the round-3 validation circuit
arrived 9 m off and every ICP attempt landed in a false minimum at fitness
1.4).  This module recovers a global (yaw, dx, dy, dz) initial transform with
a basin of half the grid extent (~±45 m) and a full 360° yaw sweep:

1. each cloud becomes a G x G bird's-eye *structure* grid — points weighted
   by height above their own ground level, so walls/poles dominate and the
   (uninformative) ground plane cancels;
2. the source grid is built under K yaw hypotheses (vmapped scatter — a
   batch dimension is nearly free on TPU);
3. every (yaw, shift) pair is scored at once by FFT cross-correlation
   (XLA lowers 2-D FFTs natively; K x (2G)^2 complex mults are trivial);
4. the best peak, normalised by grid energies, becomes the ICP warm start;
   its score doubles as a detectability diagnostic.

No reference counterpart — this is new capability the reference lacks (its
identity-init ICP silently fails under the same drift), designed TPU-first:
fixed shapes, one fused program, no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BevAlignment(NamedTuple):
    transform: jnp.ndarray   # [4, 4] map-frame correction (src -> tgt)
    score: jnp.ndarray       # normalised correlation peak in [0, 1]
    yaw: jnp.ndarray         # chosen yaw (rad)
    shift: jnp.ndarray       # [3] chosen translation (m)


def _ground_z(pts, ok, q: float = 0.1):
    """Approximate ground height: the q-quantile of valid z."""
    z = jnp.where(ok, pts[:, 2], jnp.inf)
    zs = jnp.sort(z)
    n = jnp.maximum(jnp.sum(ok), 1)
    k = jnp.clip((n.astype(jnp.float32) * q).astype(jnp.int32), 0,
                 pts.shape[0] - 1)
    return zs[k]


def _structure_grid(pts, w, center_xy, G: int, res: float):
    """Scatter height-weighted occupancy into a [G, G] grid around center."""
    rel = (pts[:, :2] - center_xy) / res
    ij = jnp.floor(rel).astype(jnp.int32) + G // 2
    inb = ((ij[:, 0] >= 0) & (ij[:, 0] < G) & (ij[:, 1] >= 0)
           & (ij[:, 1] < G))
    wi = jnp.where(inb, w, 0.0)
    ij = jnp.clip(ij, 0, G - 1)
    grid = jnp.zeros((G, G), pts.dtype).at[ij[:, 0], ij[:, 1]].add(wi)
    # saturate: a dense facade column should count like a sparse one
    return jnp.minimum(grid, 3.0)


def bev_align(src, src_ok, tgt, tgt_ok, c_src, c_tgt,
              grid: int = 96, res: float = 1.0, n_yaw: int = 24,
              max_shift: float | None = None) -> BevAlignment:
    """Global coarse alignment of map-frame clouds src -> tgt.

    ``c_src`` / ``c_tgt``: xy grid centres (the latest / candidate keypose
    positions).  Returns the rigid transform (z-rotation + 3-D translation)
    to apply to ``src`` points, with rotation pivoted so grid centres stay
    put.  ``max_shift`` (m) bounds the admissible translation |s| (defaults
    to half the grid extent)."""
    dtype = src.dtype
    G, P = grid, 2 * grid                        # zero-padded FFT size
    gz_s = _ground_z(src, src_ok)
    gz_t = _ground_z(tgt, tgt_ok)
    # height-above-ground weights: ground ~0, walls saturate at 2 m
    w_s = jnp.clip(src[:, 2] - gz_s - 0.3, 0.0, 2.0) * src_ok
    w_t = jnp.clip(tgt[:, 2] - gz_t - 0.3, 0.0, 2.0) * tgt_ok

    tgt_g = _structure_grid(tgt, w_t, c_tgt, G, res)

    yaws = (jnp.arange(n_yaw, dtype=dtype) * (2.0 * jnp.pi / n_yaw))
    yaws = jnp.where(yaws > jnp.pi, yaws - 2.0 * jnp.pi, yaws)

    def src_grid(yaw):
        cz, sz = jnp.cos(yaw), jnp.sin(yaw)
        R2 = jnp.array([[cz, -sz], [sz, cz]], dtype)
        rot = (src[:, :2] - c_src) @ R2.T + c_src
        return _structure_grid(jnp.concatenate([rot, src[:, 2:]], 1),
                               w_s, c_src, G, res)

    src_gs = jax.vmap(src_grid)(yaws)            # [K, G, G]

    # FFT cross-correlation on the zero-padded plane:
    #   corr_k[s] = sum_u src_k[u] * tgt[u + s]
    Ft = jnp.fft.rfft2(tgt_g, (P, P))
    Fs = jnp.fft.rfft2(src_gs, (P, P))
    corr = jnp.fft.irfft2(jnp.conj(Fs) * Ft[None], (P, P))  # [K, P, P]

    # admissible shifts only (wrap-around indices decode to signed shifts)
    sidx = jnp.arange(P)
    sgn = jnp.where(sidx >= G, sidx - P, sidx)   # signed cell shift
    lim = (G // 2) if max_shift is None else int(max_shift / res)
    oks = (jnp.abs(sgn) <= lim)
    corr = jnp.where(oks[None, :, None] & oks[None, None, :], corr, -jnp.inf)

    flat = corr.reshape(n_yaw, -1)
    best_per_yaw = jnp.argmax(flat, axis=1)
    val_per_yaw = jnp.take_along_axis(flat, best_per_yaw[:, None],
                                      axis=1)[:, 0]
    k = jnp.argmax(val_per_yaw)
    peak = val_per_yaw[k]
    bi = best_per_yaw[k]
    dx = sgn[bi // P].astype(dtype) * res
    dy = sgn[bi % P].astype(dtype) * res
    dz = gz_t - gz_s

    # normalised score: peak / (|src| |tgt|) — 1.0 means perfect overlap of
    # identically-shaped grids
    es = jnp.sqrt(jnp.sum(src_gs[k] ** 2) * jnp.sum(tgt_g ** 2))
    score = peak / jnp.maximum(es, 1e-6)

    yaw = yaws[k]
    cz, sz = jnp.cos(yaw), jnp.sin(yaw)
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]], dtype)
    pivot = jnp.array([c_src[0], c_src[1], 0.0], dtype)
    # matching src cell u with tgt cell u+s places world point
    # c_src + u*res at c_tgt + (u+s)*res: the applied translation is the
    # centre offset PLUS the cell shift
    shift = jnp.array([c_tgt[0] - c_src[0] + dx,
                       c_tgt[1] - c_src[1] + dy, dz], dtype)
    t = pivot - Rz @ pivot + shift
    T = jnp.eye(4, dtype=dtype).at[:3, :3].set(Rz).at[:3, 3].set(t)
    return BevAlignment(transform=T, score=score, yaw=yaw, shift=shift)
