"""Range-image segmentation + compaction (stage-1 back half).

The reference labels connected components with a sequential BFS flood fill per
seed pixel (``/root/reference/src/IP.cpp:306-412``).  Queues and data-dependent
loops do not map to XLA, so this module re-designs the pass as *parallel
connected-component labelling*: every segmentable pixel starts as its own
label (its flat index), labels are min-propagated across 4-connected neighbours
that pass the reference's angle criterion (IP.cpp:365-366), and pointer-jumping
(label <- label[label]) gives O(log N) convergence.  Component validity
(IP.cpp:378-397) and the outlier/ground subsampling of the compaction loop
(IP.cpp:254-287) are reproduced as masked reductions.

Compaction departs from the reference's single flat "segmented cloud": we emit
a ring-major [n_scan, ring_width] layout.  The reference's downstream indexing
(startRingIndex/endRingIndex + per-ring sectors) never lets a feature window
cross a ring boundary, so the per-ring layout is semantically equivalent and
maps better onto TPU tiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from .projection import RangeImage


class SegmentedScan(NamedTuple):
    """Ring-major compacted scan, the stage-1 -> stage-2 contract.

    Equivalent of the segmented cloud + ``alego/cloud_info`` side channel
    (msg/cloud_info.msg:1-11): per-point column, range and ground flag ride
    along as dense arrays.
    """

    points: jnp.ndarray   # [R, W, 3]
    ranges: jnp.ndarray   # [R, W]
    cols: jnp.ndarray     # [R, W] int32 original column index
    ground: jnp.ndarray   # [R, W] bool
    valid: jnp.ndarray    # [R, W] bool
    counts: jnp.ndarray   # [R] int32 points per ring
    outlier_points: jnp.ndarray  # [MO, 3]
    outlier_valid: jnp.ndarray   # [MO] bool
    # sweep-orientation metadata (cloud_info msg fields 2-4, IP.cpp:120-130);
    # defaulted to a uniform spin so tests can fabricate scans without it
    orient_start: jnp.ndarray = np.float32(0.0)
    orient_diff: jnp.ndarray = np.float32(2 * np.pi)
    # outlier column indices, needed so de-skew can move the outlier cloud
    # with the segmented cloud (the surf map merges BOTH, LM.cpp:385-387 —
    # de-skewing only one smears every surface into two misaligned copies).
    # Defaulted for fabricated test scans.
    outlier_cols: jnp.ndarray = np.zeros(0, np.int32)  # [MO] int32


def _neighbor_connectivity(ranges: jnp.ndarray, segmentable: jnp.ndarray,
                           cfg: PipelineConfig):
    """Boolean masks linking each pixel to its right and upper neighbour.

    The criterion is symmetric in the two ranges (d1 = max, d2 = min,
    IP.cpp:351-366), so one mask per undirected edge direction suffices.
    Columns wrap around (IP.cpp:337-344); rows do not.
    """
    alpha_x = jnp.asarray(cfg.ang_res_x, ranges.dtype)
    alpha_y = jnp.asarray(cfg.ang_res_y, ranges.dtype)

    def edge_ok(a, b, alpha):
        d1 = jnp.maximum(a, b)
        d2 = jnp.minimum(a, b)
        ang = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha))
        return ang > cfg.seg_theta

    right_rng = jnp.roll(ranges, -1, axis=1)
    right_seg = jnp.roll(segmentable, -1, axis=1)
    conn_right = segmentable & right_seg & edge_ok(ranges, right_rng, alpha_x)

    up_rng = ranges[1:]
    conn_up = segmentable[:-1] & segmentable[1:] & edge_ok(ranges[:-1], up_rng, alpha_y)
    return conn_right, conn_up


def _reach_masks(conn_right: jnp.ndarray):
    """Doubling reachability: masks[k][i] == columns i and i+2^k circularly
    connected through an unbroken run.  Computed once per frame; each CCL
    iteration then collapses whole rows with pure roll+min ops (gather-free,
    and the circular roll handles the column seam natively)."""
    H = conn_right.shape[1]
    masks = [conn_right]
    d = 1
    while d < H:
        masks.append(masks[-1] & jnp.roll(masks[-1], -d, axis=1))
        d *= 2
    return masks


def _row_run_min(lab: jnp.ndarray, masks) -> jnp.ndarray:
    """Min label over each horizontally connected (circular) run, by
    iterative doubling against the precomputed reach masks."""
    big = jnp.int32(2 ** 30)
    for k, Ck in enumerate(masks):
        d = 1 << k
        fwd = jnp.where(Ck, jnp.roll(lab, -d, axis=1), big)
        bwd = jnp.where(jnp.roll(Ck, d, axis=1), jnp.roll(lab, d, axis=1), big)
        lab = jnp.minimum(lab, jnp.minimum(fwd, bwd))
    return lab


def label_components(img: RangeImage, cfg: PipelineConfig):
    """Parallel CCL. Returns (labels [R, H] int32, seg_ok, outlier_px).

    labels: flat-index representative for segmentable pixels, -1 elsewhere.
    seg_ok: pixel belongs to a valid segment; outlier_px: pixel belongs to a
    rejected segment (reference label 999999, IP.cpp:405-410).

    Algorithm: alternate (a) horizontal run-min via segmented prefix scans
    (collapses entire rows in O(log H) elementwise steps, no gathers — random
    gathers are the slowest TPU primitive) with (b) vertical neighbour-min
    over the 16 rings, until fixpoint.  Information crosses one vertical edge
    per iteration but entire horizontal runs at once, so convergence takes
    O(#rings) iterations, not O(component diameter).
    """
    R, H = img.ranges.shape
    segmentable = img.valid & ~img.ground

    conn_right, conn_up = _neighbor_connectivity(img.ranges, segmentable, cfg)

    big = jnp.int32(R * H)

    if jax.default_backend() == "tpu":
        # fused Pallas fixpoint: same algorithm resident in VMEM — the XLA
        # while_loop pays ~80 us/round of carry/dispatch overhead for ~23
        # rounds (benchmarks/stage1_breakdown.py); the kernel pays VPU work
        # only.  Identical labels (fixpoint is schedule-invariant).
        from .pallas_ccl import ccl_fixpoint_pallas
        labels = ccl_fixpoint_pallas(conn_right, conn_up)
        return _component_stats(labels, segmentable, cfg, R, H, big)

    masks = _reach_masks(conn_right)

    flat = jnp.arange(R * H, dtype=jnp.int32).reshape(R, H)
    init = flat

    def vertical_fixpoint(lab):
        # complete vertical chain collapse: 16-row unrolled down+up sweeps
        rows = [lab[i] for i in range(R)]
        for i in range(1, R):
            rows[i] = jnp.minimum(rows[i], jnp.where(conn_up[i - 1],
                                                     rows[i - 1], big))
        for i in range(R - 2, -1, -1):
            rows[i] = jnp.minimum(rows[i], jnp.where(conn_up[i],
                                                     rows[i + 1], big))
        return jnp.stack(rows)

    def body(state):
        lab, _ = state
        new = vertical_fixpoint(_row_run_min(lab, masks))
        changed = jnp.any(new != lab)
        return new, changed

    # Negative result (round 2): pointer jumping (label <- min(label,
    # label[label]), 2 hops/round) to cut the ~23 H+V rounds was measured
    # SLOWER on v5e — each hop is a 64k random int32 gather, and CCL total
    # went ~1.5 ms -> 3.5 ms.  Random gathers lose to extra gather-free
    # rounds here, as everywhere else in this codebase.

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (init, jnp.bool_(True)))
    return _component_stats(labels, segmentable, cfg, R, H, big)


def _component_stats(labels, segmentable, cfg: PipelineConfig, R, H, big):
    """Segment validity (IP.cpp:378-397) from fixpoint labels.

    Scatter- AND gather-free (round 4): the natural formulation — two 64k
    scatter-adds into a [R*H+1] table plus a 64k random gather back — costs
    ~1.6 ms on v5e (0.54 + 0.58 + 0.49; TPU scatter is row-serial, same
    lesson as the voxel grids), while a [16, 4000] sort costs 0.005 ms.
    So: ONE 2N-row 3-operand sort groups every count contribution by label
    (pixels contribute 1 to their component size; first-occurrence-in-row
    indicators contribute 1 << 20 to its distinct-ring count — both fit one
    int32: sizes < 2^17, rings <= 16), segmented associative scans produce
    per-segment totals in place, and a second 2-operand sort on the carried
    original position unsorts the verdict back to pixels.  Measured 1.68 ->
    0.95 ms (benchmarks/stage1_opt.py), bit-identical outputs."""
    N = R * H
    flat = jnp.where(segmentable, labels, big).reshape(-1)

    # distinct-ring indicators (seg_valid_line_num, IP.cpp:389-397): a
    # component appears in row r iff exactly one first-occurrence fires
    # there (row-sort + adjacent-compare)
    srt = jax.lax.sort(jnp.where(segmentable, labels, big), dimension=1)
    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), srt[:, :-1]], axis=1)
    first = (srt != prev) & (srt < big)
    fl = jnp.where(first, srt, big).reshape(-1)

    keys = jnp.concatenate([flat, fl])
    vals = jnp.concatenate([
        jnp.where(flat < big, 1, 0),
        jnp.where(fl < big, 1 << 20, 0)]).astype(jnp.int32)
    orig = jnp.concatenate([jnp.arange(N, dtype=jnp.int32),
                            jnp.full((N,), big, jnp.int32)])
    keys_s, vals_s, orig_s = jax.lax.sort((keys, vals, orig), num_keys=1)

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])

    def comb_sum(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, av + bv), ar | br

    pref = jax.lax.associative_scan(comb_sum, (vals_s, new_seg))[0]
    # broadcast each segment's last prefix (= its total) backward; in a
    # reverse scan `a` is the accumulated suffix and `b` the current
    # (earlier) element, which shadows the suffix when marked
    last = jnp.concatenate([new_seg[1:], jnp.ones((1,), bool)])

    def comb_copy(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, av), ar | br

    total = jax.lax.associative_scan(
        comb_copy, (jnp.where(last, pref, 0), last), reverse=True)[0]

    sizes = total & ((1 << 20) - 1)
    rings = total >> 20
    ok_seg = (sizes >= cfg.seg_big_cluster) | (
        (sizes >= cfg.seg_valid_point_num)
        & (rings >= cfg.seg_valid_line_num))

    # unsort the pixel stream by original position (indicator rows carry
    # position N and sort to the tail)
    _, ok_px = jax.lax.sort((orig_s, ok_seg.astype(jnp.int32)), num_keys=1)
    per_px_valid = (ok_px[:N] > 0).reshape(R, H)

    seg_ok = segmentable & per_px_valid
    outlier_px = segmentable & ~per_px_valid
    labels_out = jnp.where(segmentable, labels, -1)
    return labels_out, seg_ok, outlier_px


def compact(img: RangeImage, seg_ok: jnp.ndarray, outlier_px: jnp.ndarray,
            cfg: PipelineConfig) -> SegmentedScan:
    """Masked compaction into the ring-major layout (IP.cpp:254-287).

    Keep rule per pixel: valid-segment points always; ground points only at
    every 5th column or within 5 columns of the sweep edges (IP.cpp:271-277).
    Outlier cloud: rejected-segment points above ring ``ground_scan_id`` at
    every 5th column (IP.cpp:263-270).
    """
    R, H = img.ranges.shape
    W = cfg.ring_width
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, H), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, H), 0)

    ground_keep = img.ground & ~(
        (cols % cfg.ground_subsample != 0) & (cols > 4) & (cols < H - 5))
    keep = seg_ok | ground_keep

    # stable per-row compaction: payloads ride the sort (gather-free).
    # col/ground/keep share one packed-int operand — sort cost scales with
    # operand count, and these three never need more than 15 bits together.
    assert H < (1 << 13), (
        f"packed col field overflow: horizon_scan={H} >= 8192 would corrupt "
        "the ground/valid flag bits in the compaction sort operand")
    key = jnp.where(keep, 0, 1).astype(jnp.int32)
    f32 = img.points.dtype
    packed = (cols + jnp.where(img.ground, 1 << 13, 0)
              + jnp.where(keep, 1 << 14, 0))
    sorted_ops = jax.lax.sort(
        (key, img.points[..., 0], img.points[..., 1], img.points[..., 2],
         img.ranges, packed),
        dimension=1, num_keys=1, is_stable=True)
    if H < W:   # ring wider than image (tiny test geometries): pad
        sorted_ops = tuple(
            jnp.concatenate([a, jnp.zeros((R, W - H), a.dtype)], axis=1)
            for a in sorted_ops)
    _, xs, ys, zs, rngs, packs = (a[:, :W] for a in sorted_ops)
    valid = (packs & (1 << 14)) > 0
    colss = packs & ((1 << 13) - 1)
    grds = (packs & (1 << 13)) > 0
    counts = keep.sum(axis=1).astype(jnp.int32)

    pts = jnp.where(valid[..., None], jnp.stack([xs, ys, zs], -1), 0.0)
    rng = jnp.where(valid, rngs, 0.0)
    col_out = jnp.where(valid, colss, 0).astype(jnp.int32)
    grd = valid & (grds > 0)

    # outliers live strictly above ground_scan_id (IP.cpp:265) and only at
    # every outlier_subsample'th column — both static, so slice BEFORE the
    # compaction sort (4x fewer rings x subsample-factor fewer columns:
    # 64000 -> 4800 elements at the full geometry)
    g1 = cfg.ground_scan_id + 1
    out_keep = outlier_px[g1:, ::cfg.outlier_subsample].reshape(-1)
    fp = img.points[g1:, ::cfg.outlier_subsample].reshape(-1, 3)
    o_col = cols[g1:, ::cfg.outlier_subsample].reshape(-1)
    # pad whenever the subsampled pool is smaller than max_outlier — at the
    # default geometry too (5 rings x ceil(4000/5) = 4000 < 4096), not just
    # tiny test configs
    if out_keep.shape[0] < cfg.max_outlier:
        deficit = cfg.max_outlier - out_keep.shape[0]
        out_keep = jnp.concatenate([out_keep, jnp.zeros(deficit, bool)])
        fp = jnp.concatenate([fp, jnp.zeros((deficit, 3), fp.dtype)])
        o_col = jnp.concatenate([o_col, jnp.zeros(deficit, jnp.int32)])
    o_ops = jax.lax.sort(
        (jnp.where(out_keep, 0, 1).astype(jnp.int32), fp[:, 0], fp[:, 1],
         fp[:, 2], out_keep.astype(f32), o_col), num_keys=1, is_stable=True)
    o_valid = (o_ops[4] > 0)[: cfg.max_outlier]
    o_pts = jnp.stack([o_ops[1], o_ops[2], o_ops[3]], -1)[: cfg.max_outlier]
    o_cols_out = o_ops[5][: cfg.max_outlier]

    return SegmentedScan(
        points=jnp.where(valid[..., None], pts, 0.0),
        ranges=rng,
        cols=col_out,
        ground=grd,
        valid=valid,
        counts=jnp.minimum(counts, W),
        outlier_points=jnp.where(o_valid[:, None], o_pts, 0.0),
        outlier_valid=o_valid,
        orient_start=img.orient_start,
        orient_diff=img.orient_diff,
        outlier_cols=jnp.where(o_valid, o_cols_out, 0),
    )


def segment_scan(img: RangeImage, cfg: PipelineConfig) -> SegmentedScan:
    """Full stage-1 back half: CCL + validity + compaction."""
    _, seg_ok, outlier_px = label_components(img, cfg)
    return compact(img, seg_ok, outlier_px, cfg)
