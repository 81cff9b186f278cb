import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.ops import projection, segmentation
from alego_tpu.ops.projection import RangeImage, INVALID_RANGE
from alego_tpu.utils import synthetic

from reference_impls import bfs_label_components


def _img_from_ranges(ranges, ground=None):
    R, H = ranges.shape
    valid = ranges < INVALID_RANGE * 0.5
    if ground is None:
        ground = np.zeros((R, H), bool)
    # fabricate points consistent with ranges (along x)
    pts = np.zeros((R, H, 3), np.float32)
    pts[..., 0] = np.where(valid, ranges, 0)
    return RangeImage(points=jnp.asarray(pts), ranges=jnp.asarray(ranges.astype(np.float32)),
                      valid=jnp.asarray(valid), ground=jnp.asarray(ground))


def test_ccl_matches_bfs_on_synthetic_image():
    cfg = tiny_config(horizon_scan=64, ring_width=128, max_raw_points=2048)
    rng = np.random.default_rng(0)
    R, H = cfg.n_scan, 64
    ranges = np.full((R, H), INVALID_RANGE)
    # two smooth blobs at different depths + scattered noise points
    ranges[2:9, 5:25] = 10.0 + rng.normal(0, 0.01, (7, 20))
    ranges[10:14, 40:60] = 22.0 + rng.normal(0, 0.01, (4, 20))
    for _ in range(25):
        i, j = rng.integers(0, R), rng.integers(0, H)
        ranges[i, j] = rng.uniform(5, 40)

    img = _img_from_ranges(ranges)
    labels, seg_ok, outlier = segmentation.label_components(img, cfg)
    ref_labels, ref_ok, ref_out = bfs_label_components(
        ranges, np.asarray(img.valid), cfg.ang_res_x, cfg.ang_res_y, cfg.seg_theta,
        cfg.seg_big_cluster, cfg.seg_valid_point_num, cfg.seg_valid_line_num)

    np.testing.assert_array_equal(np.asarray(seg_ok), ref_ok)
    np.testing.assert_array_equal(np.asarray(outlier), ref_out)
    # same partition: bijection between label ids on segmentable pixels
    mine = np.asarray(labels)
    seg = np.asarray(img.valid)
    pairs = set(zip(mine[seg].tolist(), ref_labels[seg].tolist()))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_ccl_wraps_around_columns():
    cfg = tiny_config(horizon_scan=32, ring_width=64, max_raw_points=1024)
    R, H = cfg.n_scan, 32
    ranges = np.full((R, H), INVALID_RANGE)
    # one band crossing the column seam
    ranges[4:8, 28:] = 15.0
    ranges[4:8, :4] = 15.0
    img = _img_from_ranges(ranges)
    labels, seg_ok, _ = segmentation.label_components(img, cfg)
    lab = np.asarray(labels)
    seg = np.asarray(seg_ok)
    assert seg.sum() == 4 * 8
    assert len(np.unique(lab[seg])) == 1


def test_compact_ground_subsampling():
    cfg = tiny_config(horizon_scan=100, ring_width=128, max_raw_points=4096)
    R, H = cfg.n_scan, 100
    ranges = np.full((R, H), INVALID_RANGE)
    ranges[0, :] = 5.0
    ground = np.zeros((R, H), bool)
    ground[0, :] = True
    img = _img_from_ranges(ranges, ground)
    seg = segmentation.segment_scan(img, cfg)
    # kept ground columns: every 5th, plus cols <=4 and >= H-5 (IP.cpp:271-277)
    want = [j for j in range(H) if j % 5 == 0 or j <= 4 or j >= H - 5]
    got = np.asarray(seg.cols[0])[np.asarray(seg.valid[0])]
    np.testing.assert_array_equal(sorted(got.tolist()), want)
    assert bool(np.asarray(seg.ground[0]).any())


def test_full_stage1_on_rendered_scan():
    cfg = tiny_config()
    world = synthetic.make_world(seed=4)
    pts = synthetic.render_scan(world, np.eye(4), cfg)
    good = np.isfinite(pts).all(-1)
    pad = np.where(good[:, None], pts, 0.0)[: cfg.max_raw_points]
    img = projection.project_scan(jnp.asarray(pad), jnp.asarray(good[: cfg.max_raw_points]), cfg)
    seg = segmentation.segment_scan(img, cfg)
    counts = np.asarray(seg.counts)
    assert counts.sum() > 500
    assert bool(np.asarray(seg.valid).any())
    # ranges of valid entries are finite and >= min_range
    v = np.asarray(seg.valid)
    r = np.asarray(seg.ranges)[v]
    assert np.isfinite(r).all() and (r >= cfg.min_range).all()


def test_pallas_ccl_matches_xla_fixpoint():
    """The fused VMEM CCL kernel (interpret mode) produces the identical
    fixpoint as the XLA while_loop path, including seam-crossing runs."""
    from alego_tpu.ops.pallas_ccl import ccl_fixpoint_pallas

    cfg = tiny_config(horizon_scan=64, ring_width=128, max_raw_points=2048)
    rng = np.random.default_rng(7)
    R, H = cfg.n_scan, 64
    ranges = np.full((R, H), INVALID_RANGE)
    ranges[2:9, 5:25] = 10.0 + rng.normal(0, 0.01, (7, 20))
    ranges[10:14, 40:60] = 22.0 + rng.normal(0, 0.01, (4, 20))
    ranges[4:8, 60:] = 15.0     # seam-crossing band
    ranges[4:8, :6] = 15.0
    for _ in range(30):
        i, j = rng.integers(0, R), rng.integers(0, H)
        ranges[i, j] = rng.uniform(5, 40)

    img = _img_from_ranges(ranges)
    segm = np.asarray(img.valid & ~img.ground)
    conn_right, conn_up = segmentation._neighbor_connectivity(
        img.ranges, jnp.asarray(segm), cfg)

    # XLA fixpoint via the public entry (CPU backend dispatches to it)
    labels_xla, _, _ = segmentation.label_components(img, cfg)
    labels_pl = ccl_fixpoint_pallas(conn_right, conn_up, interpret=True)

    np.testing.assert_array_equal(np.asarray(labels_xla)[segm],
                                  np.asarray(labels_pl)[segm])
