"""Corner/surf feature extraction (stage 2 front half).

Re-design of ``/root/reference/src/LO.cpp:187-365`` for the ring-major layout:

* 11-point smoothness becomes a correlation along the ring axis (LO.cpp:193);
* occluded/parallel marking (LO.cpp:200-229) becomes shifted-array dilations;
* the order-sensitive "sort by curvature, pick, suppress 5 neighbours"
  sector loop (LO.cpp:242-348) is replaced by an *iterated masked argmax*:
  repeatedly taking the extremal eligible point reproduces the reference's
  sorted visit order exactly — including the interaction where an earlier
  pick's suppression removes later candidates — with a static trip count
  (<= 22 picks/sector for corners, 4 for flats), vmapped over rings.

The flat "cloud_label" convention is kept: 2 sharp, 1 less-sharp, -1 flat,
0 none; less-flat = all label <= 0 sector points, voxel-filtered at 0.4 m per
ring (LO.cpp:350-364).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from .segmentation import SegmentedScan
from .voxel import voxel_downsample_exact, compact_masked

NEG = -1e30
POS = 1e30


class FeatureClouds(NamedTuple):
    """Stage-2 feature sets. ``*_ring`` carries the ring id the reference
    stores in ``intensity`` (LO.cpp:418,507) for ring-constrained search."""

    sharp_pts: jnp.ndarray        # [MS, 3]
    sharp_valid: jnp.ndarray      # [MS]
    sharp_ring: jnp.ndarray       # [MS] int32
    less_sharp_pts: jnp.ndarray   # [MLS, 3]
    less_sharp_valid: jnp.ndarray
    less_sharp_ring: jnp.ndarray
    flat_pts: jnp.ndarray         # [MF, 3]
    flat_valid: jnp.ndarray
    flat_ring: jnp.ndarray
    less_flat_pts: jnp.ndarray    # [MLF, 3]
    less_flat_valid: jnp.ndarray
    less_flat_ring: jnp.ndarray


def curvature_and_window(seg: SegmentedScan, cfg: PipelineConfig):
    """Curvature (LO.cpp:193-194) + the per-ring index window where features
    may live: k in [5, count-7] (the union of the 6 sector ranges)."""
    r = seg.ranges
    W = r.shape[1]
    acc = -10.0 * r
    for d in range(1, 6):
        acc = acc + jnp.roll(r, d, axis=1) + jnp.roll(r, -d, axis=1)
    curv = acc * acc
    k = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    in_window = (k >= 5) & (k <= seg.counts[:, None] - 7)
    return curv, in_window


def occlusion_mask(seg: SegmentedScan, cfg: PipelineConfig) -> jnp.ndarray:
    """Initial neighbor_picked state from occluded/parallel tests
    (LO.cpp:200-229), vectorised with one-sided dilations."""
    r, c = seg.ranges, seg.cols
    d2 = jnp.roll(r, -1, axis=1)            # depth of k+1
    col_diff = jnp.abs(c - jnp.roll(c, -1, axis=1))
    near = col_diff < cfg.occl_col_gap
    both = seg.valid & jnp.roll(seg.valid, -1, axis=1)
    cond1 = both & near & (r - d2 > cfg.occl_depth_jump)   # mark k-5..k
    cond2 = both & near & (d2 - r > cfg.occl_depth_jump)   # mark k+1..k+5

    picked = jnp.zeros(r.shape, bool)
    for l in range(0, 6):
        picked = picked | jnp.roll(cond1, -l, axis=1)      # flag at k marks k-5..k
    for l in range(1, 6):
        picked = picked | jnp.roll(cond2, l, axis=1)       # flag at k marks k+1..k+5

    diff_prev = jnp.abs(jnp.roll(r, 1, axis=1) - r)
    diff_next = jnp.abs(d2 - r)
    parallel = (diff_prev > cfg.parallel_rel_diff * r) & (diff_next > cfg.parallel_rel_diff * r)
    return picked | parallel


def _suppress(picked: jnp.ndarray, cols: jnp.ndarray, k: jnp.ndarray,
              cfg: PipelineConfig) -> jnp.ndarray:
    """Mark up to 5 neighbours each side of pick ``k``, stopping at a column
    gap > 10 (LO.cpp:282-305). Window [k-5, k+5] is in-bounds by the sector
    range invariant (sp >= 5, ep <= count-7 <= W-7)."""
    ns = cfg.suppress_neighbors
    win_cols = jax.lax.dynamic_slice(cols, (k - ns,), (2 * ns + 1,))
    gaps = jnp.abs(win_cols[1:] - win_cols[:-1])            # gap[l] between k-5+l, k-5+l+1
    ok_gap = gaps <= cfg.suppress_col_gap
    # forward: l=1..5 marked iff all gaps (k..k+l) small
    fwd = jnp.cumprod(ok_gap[ns:].astype(jnp.int32)).astype(bool)
    # backward: l=1..5 marked iff all gaps (k-l..k) small
    bwd = jnp.cumprod(ok_gap[:ns][::-1].astype(jnp.int32)).astype(bool)
    upd = jnp.concatenate([bwd[::-1], jnp.zeros((1,), bool), fwd])
    cur = jax.lax.dynamic_slice(picked, (k - ns,), (2 * ns + 1,))
    return jax.lax.dynamic_update_slice(picked, cur | upd, (k - ns,))


def _pick_ring(curv, cols, ground, picked0, in_window, count, cfg: PipelineConfig):
    """Sequential sector picking for one ring; returns label [W] int32."""
    W = curv.shape[0]
    idxs = jnp.arange(W, dtype=jnp.int32)
    label = jnp.zeros(W, jnp.int32)
    picked = picked0 | ~in_window

    start = jnp.int32(5)
    diff = count - 11  # end - start with end = count - 6
    n_corner_steps = cfg.max_less_sharp_per_sector + 2  # picks incl. break step
    for j in range(cfg.n_sectors):
        sp = start + j * diff // cfg.n_sectors
        ep = start + (j + 1) * diff // cfg.n_sectors - 1
        sector_ok = (sp < ep) & (diff > 0)
        in_sector = (idxs >= sp) & (idxs <= ep) & sector_ok & in_window

        # ---- corner pass: descending curvature (LO.cpp:260-307) ----
        def corner_body(_, st):
            label, picked, n, stopped = st
            elig = in_sector & ~picked & (curv > cfg.edge_curv_thresh) & ~ground
            has = elig.any() & ~stopped
            k = jnp.argmax(jnp.where(elig, curv, NEG)).astype(jnp.int32)
            n_new = jnp.where(has, n + 1, n)
            lab_val = jnp.where(n_new <= cfg.max_sharp_per_sector, 2,
                                jnp.where(n_new <= cfg.max_less_sharp_per_sector, 1, 0))
            overflow = n_new > cfg.max_less_sharp_per_sector
            label = jnp.where(has & ~overflow,
                              label.at[k].set(lab_val), label)
            picked = jnp.where(has, picked.at[k].set(True), picked)
            do_sup = has & ~overflow
            picked = jnp.where(do_sup, _suppress(picked, cols, k, cfg), picked)
            stopped = stopped | (has & overflow)
            return label, picked, n_new, stopped

        label, picked, _, _ = jax.lax.fori_loop(
            0, n_corner_steps, corner_body,
            (label, picked, jnp.int32(0), jnp.bool_(False)))

        # ---- flat pass: ascending curvature, ground only (LO.cpp:309-348) ----
        def flat_body(_, st):
            label, picked, n = st
            elig = in_sector & ~picked & (curv < cfg.edge_curv_thresh) & ground
            has = elig.any()
            k = jnp.argmin(jnp.where(elig, curv, POS)).astype(jnp.int32)
            n_new = jnp.where(has, n + 1, n)
            label = jnp.where(has, label.at[k].set(-1), label)
            picked = jnp.where(has, picked.at[k].set(True), picked)
            do_sup = has & (n_new < cfg.max_flat_per_sector)
            picked = jnp.where(do_sup, _suppress(picked, cols, k, cfg), picked)
            return label, picked, n_new

        label, picked, _ = jax.lax.fori_loop(
            0, cfg.max_flat_per_sector, flat_body, (label, picked, jnp.int32(0)))
    return label


def _pick_ring_parallel(curv, cols, ground, picked0, in_window, count,
                        cfg: PipelineConfig):
    """All 6 sectors pick simultaneously each step (lane-parallel variant).

    Equivalent to :func:`_pick_ring` except that within one iteration every
    sector takes its best eligible point at once; the reference's strict
    sector order only differs when two sectors' picks land within the 5-column
    suppression radius of each other in the same step, while cutting
    sequential steps 6x.  Measured ATE effect (TPU v5e, f32-HIGHEST, fixed
    seeds — benchmarks/sector_mode_delta.{py,json}): parallel-vs-exact is
    +0.10/-0.03/-0.09 m across the three golden scenarios (~0.1 m base ATE)
    — chaotic trajectory divergence with no systematic bias; parallel wins
    2 of 3 and stays the default.
    """
    W = curv.shape[0]
    S = cfg.n_sectors
    ns = cfg.suppress_neighbors
    idxs = jnp.arange(W, dtype=jnp.int32)
    j = jnp.arange(S, dtype=jnp.int32)
    diff = count - 11
    sp = 5 + j * diff // S
    ep = 5 + (j + 1) * diff // S - 1
    sector_ok = (sp < ep) & (diff > 0)
    in_sector = ((idxs[None, :] >= sp[:, None]) & (idxs[None, :] <= ep[:, None])
                 & sector_ok[:, None] & in_window[None, :])       # [S, W]

    label = jnp.zeros(W, jnp.int32)
    picked = picked0 | ~in_window

    # Precompute col-gap run masks once: Gf[l][i] == all of the l column gaps
    # starting at i are <= 10, i.e. position i+l is reachable from a pick at
    # i (and symmetrically i is reachable from a pick at i+l).  Turns the
    # per-pick dynamic-slice windows into pure comparisons (TPU-fast).
    gap_ok = jnp.concatenate(
        [jnp.abs(cols[1:] - cols[:-1]) <= cfg.suppress_col_gap,
         jnp.zeros((1,), bool)])
    Gf = []  # Gf[l-1][i] = all gap_ok[i .. i+l-1]
    for l in range(1, ns + 1):
        shifted = jnp.roll(gap_ok, -(l - 1))
        if l > 1:
            shifted = shifted.at[W - (l - 1):].set(False)
        Gf.append((Gf[-1] if Gf else jnp.ones(W, bool)) & shifted)

    def suppression(kj, do):
        """[S] picks -> OR of their gap-limited +-5 windows, via equality."""
        m = jnp.zeros((kj.shape[0], W), bool)
        for l in range(1, ns + 1):
            gf_at_k = Gf[l - 1][kj]                       # [S] tiny gather
            m = m | ((idxs[None, :] == (kj + l)[:, None]) & gf_at_k[:, None])
            m = m | ((idxs[None, :] == (kj - l)[:, None]) & Gf[l - 1][None, :])
        return jnp.any(m & do[:, None], axis=0)

    def picks_mask(kj, do):
        return jnp.any((idxs[None, :] == kj[:, None]) & do[:, None], axis=0)

    corner_ok = (curv > cfg.edge_curv_thresh) & ~ground

    def corner_body(_, st):
        label, picked, n, stopped = st
        elig = in_sector & (corner_ok & ~picked)[None, :]
        has = elig.any(axis=1) & ~stopped
        kj = jnp.argmax(jnp.where(elig, curv[None, :], NEG), axis=1).astype(jnp.int32)
        n_new = n + has.astype(jnp.int32)
        lab_val = jnp.where(n_new <= cfg.max_sharp_per_sector, 2,
                            jnp.where(n_new <= cfg.max_less_sharp_per_sector, 1, 0))
        overflow = n_new > cfg.max_less_sharp_per_sector
        do_label = has & ~overflow
        upd = jnp.sum(((idxs[None, :] == kj[:, None]) & do_label[:, None])
                      * lab_val[:, None], axis=0)          # sectors disjoint
        label = jnp.where(upd > 0, upd, label)
        picked = picked | picks_mask(kj, has)
        picked = picked | suppression(kj, do_label)
        stopped = stopped | (has & overflow)
        return label, picked, n_new, stopped

    n_corner_steps = cfg.max_less_sharp_per_sector + 1
    label, picked, _, _ = jax.lax.fori_loop(
        0, n_corner_steps, corner_body,
        (label, picked, jnp.zeros(S, jnp.int32), jnp.zeros(S, bool)))

    flat_ok = (curv < cfg.edge_curv_thresh) & ground

    def flat_body(_, st):
        label, picked, n = st
        elig = in_sector & (flat_ok & ~picked)[None, :]
        has = elig.any(axis=1)
        kj = jnp.argmin(jnp.where(elig, curv[None, :], POS), axis=1).astype(jnp.int32)
        n_new = n + has.astype(jnp.int32)
        label = jnp.where(picks_mask(kj, has), -1, label)
        picked = picked | picks_mask(kj, has)
        do_sup = has & (n_new < cfg.max_flat_per_sector)
        picked = picked | suppression(kj, do_sup)
        return label, picked, n_new

    label, picked, _ = jax.lax.fori_loop(
        0, cfg.max_flat_per_sector, flat_body,
        (label, picked, jnp.zeros(S, jnp.int32)))
    return label


def extract_features(seg: SegmentedScan, cfg: PipelineConfig) -> FeatureClouds:
    R, W = seg.ranges.shape
    curv, in_window = curvature_and_window(seg, cfg)
    picked0 = occlusion_mask(seg, cfg)

    picker = _pick_ring_parallel if cfg.parallel_sectors else _pick_ring
    labels = jax.vmap(lambda c, co, g, p, w, n: picker(c, co, g, p, w, n, cfg))(
        curv, seg.cols, seg.ground, picked0, in_window, seg.counts)

    ring_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)

    def gather(mask, cap):
        pts, valid, ring = compact_masked(
            seg.points.reshape(-1, 3), mask.reshape(-1), cap,
            aux=ring_ids.reshape(-1))
        return pts, valid, ring

    sharp_pts, sharp_valid, sharp_ring = gather(labels == 2, cfg.max_sharp)
    ls_pts, ls_valid, ls_ring = gather(labels >= 1, cfg.max_less_sharp)
    flat_pts, flat_valid, flat_ring = gather(labels == -1, cfg.max_flat)

    # less-flat: every sector point with label <= 0, voxel 0.4 per ring
    lf_mask = (labels <= 0) & in_window & seg.valid
    cap_ring = cfg.max_less_flat // R

    def ring_ds(pts, mask):
        return voxel_downsample_exact(pts, mask, cfg.less_flat_leaf, cap_ring)

    lf_pts_r, lf_valid_r = jax.vmap(ring_ds)(seg.points, lf_mask)
    lf_ring_r = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                                 (R, cap_ring))
    lf_pts = lf_pts_r.reshape(-1, 3)
    lf_valid = lf_valid_r.reshape(-1)
    lf_ring = lf_ring_r.reshape(-1)

    return FeatureClouds(
        sharp_pts=sharp_pts, sharp_valid=sharp_valid, sharp_ring=sharp_ring,
        less_sharp_pts=ls_pts, less_sharp_valid=ls_valid, less_sharp_ring=ls_ring,
        flat_pts=flat_pts, flat_valid=flat_valid, flat_ring=flat_ring,
        less_flat_pts=lf_pts, less_flat_valid=lf_valid, less_flat_ring=lf_ring,
    )
