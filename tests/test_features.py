import numpy as np
import jax
import jax.numpy as jnp

from alego_tpu.config import tiny_config
from alego_tpu.ops import features, projection, segmentation
from alego_tpu.ops.segmentation import SegmentedScan
from alego_tpu.utils import synthetic

from reference_impls import sequential_feature_pick, voxel_centroid


def _fake_seg(ranges, cols, ground, counts, cfg):
    R, W = ranges.shape
    valid = np.arange(W)[None, :] < counts[:, None]
    pts = np.zeros((R, W, 3), np.float32)
    pts[..., 0] = ranges
    pts[..., 1] = np.arange(W)[None, :] * 0.05
    return SegmentedScan(
        points=jnp.asarray(pts), ranges=jnp.asarray(ranges.astype(np.float32)),
        cols=jnp.asarray(cols.astype(np.int32)), ground=jnp.asarray(ground & valid),
        valid=jnp.asarray(valid), counts=jnp.asarray(counts.astype(np.int32)),
        outlier_points=jnp.zeros((cfg.max_outlier, 3), jnp.float32),
        outlier_valid=jnp.zeros(cfg.max_outlier, bool),
        orient_start=jnp.float32(0.0),
        orient_diff=jnp.float32(2 * np.pi))


def test_curvature_formula():
    cfg = tiny_config()
    R, W = cfg.n_scan, cfg.ring_width
    rng = np.random.default_rng(0)
    ranges = rng.uniform(5, 30, (R, W))
    counts = np.full(R, W, np.int64)
    seg = _fake_seg(ranges, np.arange(W)[None].repeat(R, 0), np.zeros((R, W), bool),
                    counts, cfg)
    curv, win = features.curvature_and_window(seg, cfg)
    k = 100
    d = ranges[0, k - 5 : k + 6].sum() - 11 * ranges[0, k] + ranges[0, k] * 1  # window sum - 10r
    want = (ranges[0, k - 5 : k + 6].sum() - ranges[0, k] - 10 * ranges[0, k]) ** 2
    np.testing.assert_allclose(np.asarray(curv)[0, k], want, rtol=1e-4)
    assert bool(np.asarray(win)[0, 5]) and not bool(np.asarray(win)[0, 4])


def test_picking_matches_sequential_oracle():
    cfg = tiny_config().replace(parallel_sectors=False)
    R, W = cfg.n_scan, 256
    cfg = cfg.replace(ring_width=W)
    rng = np.random.default_rng(1)
    # piecewise-linear ranges with corners + smooth ground -> rich curvature
    base = np.cumsum(rng.uniform(-0.2, 0.2, (R, W)), axis=1) + 10
    jumps = rng.random((R, W)) < 0.03
    ranges = base + np.cumsum(jumps * rng.uniform(1, 3, (R, W)), axis=1)
    cols = (np.arange(W)[None, :] * 3 + rng.integers(0, 2, (R, W))).astype(np.int64)
    ground = rng.random((R, W)) < 0.4
    counts = rng.integers(120, W, R)

    seg = _fake_seg(ranges, cols, ground, counts, cfg)
    curv, win = features.curvature_and_window(seg, cfg)
    picked0 = features.occlusion_mask(seg, cfg)

    labels = jax.vmap(lambda c, co, g, p, w, n: features._pick_ring(
        c, co, g, p, w, n, cfg))(curv, seg.cols, seg.ground, picked0, win, seg.counts)
    labels = np.asarray(labels)

    curv_np = np.asarray(curv)
    picked_np = np.asarray(picked0)
    win_np = np.asarray(win)
    ground_np = np.asarray(seg.ground)
    valid_np = np.asarray(seg.valid)
    for i in range(R):
        want = sequential_feature_pick(
            curv_np[i], np.asarray(seg.cols)[i], ground_np[i], valid_np[i],
            picked_np[i] | ~win_np[i])
        np.testing.assert_array_equal(labels[i], want, err_msg=f"ring {i}")


def test_parallel_sectors_close_to_exact():
    """Lane-parallel picking agrees with the exact order except at rare
    sector-boundary interactions."""
    cfg_e = tiny_config().replace(parallel_sectors=False, ring_width=256)
    cfg_p = cfg_e.replace(parallel_sectors=True)
    rng = np.random.default_rng(9)
    R, W = cfg_e.n_scan, 256
    base = np.cumsum(rng.uniform(-0.2, 0.2, (R, W)), axis=1) + 10
    jumps = rng.random((R, W)) < 0.03
    ranges = base + np.cumsum(jumps * rng.uniform(1, 3, (R, W)), axis=1)
    cols = (np.arange(W)[None, :] * 3).astype(np.int64).repeat(R, 0).reshape(R, W)
    ground = rng.random((R, W)) < 0.4
    counts = rng.integers(150, W, R)
    seg = _fake_seg(ranges, cols, ground, counts, cfg_e)

    fe = features.extract_features(seg, cfg_e)
    fp = features.extract_features(seg, cfg_p)
    for name in ("sharp", "less_sharp", "flat"):
        a = np.asarray(getattr(fe, f"{name}_pts"))[np.asarray(getattr(fe, f"{name}_valid"))]
        b = np.asarray(getattr(fp, f"{name}_pts"))[np.asarray(getattr(fp, f"{name}_valid"))]
        sa = {tuple(np.round(x, 4)) for x in a}
        sb = {tuple(np.round(x, 4)) for x in b}
        inter = len(sa & sb)
        denom = max(len(sa | sb), 1)
        if denom < 20:     # tiny classes: one boundary flip swings the ratio
            continue
        assert inter / denom > 0.85, (name, len(sa), len(sb), inter)


def test_voxel_downsample_exact_matches_dict_oracle():
    from alego_tpu.ops.voxel import voxel_downsample_exact

    rng = np.random.default_rng(2)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    mask = rng.random(500) < 0.8
    out, m = voxel_downsample_exact(jnp.asarray(pts), jnp.asarray(mask), 0.9, 512)
    got = np.asarray(out)[np.asarray(m)]
    want = voxel_centroid(pts[mask], 0.9)
    got_s = got[np.lexsort(got.T)]
    want_s = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_s, want_s, atol=1e-4)


def test_voxel_downsample_hash_near_complete():
    """Hash-table variant: centroids exact for surviving voxels, low loss."""
    from alego_tpu.ops.voxel import voxel_downsample

    rng = np.random.default_rng(3)
    pts = rng.uniform(-40, 40, (8000, 3)).astype(np.float32)
    mask = np.ones(8000, bool)
    want = voxel_centroid(pts, 1.1)          # ~ thousands of voxels
    cap = 4 * len(want)                      # load factor ~0.25
    out, m = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.1, cap)
    got = np.asarray(out)[np.asarray(m)]
    # at least 99% of voxels survive the 3-probe hash
    assert len(got) >= 0.99 * len(want), (len(got), len(want))
    # surviving centroids are exactly the oracle centroids (match by cell)
    want_by_cell = {tuple(np.floor(c / 1.1).astype(int)): c for c in want}
    for c in got[:200]:
        key = tuple(np.floor(c / 1.1).astype(int))
        assert key in want_by_cell
        np.testing.assert_allclose(c, want_by_cell[key], atol=1e-4)


def test_full_feature_extraction_on_rendered_scan():
    cfg = tiny_config()
    world = synthetic.make_world(seed=5)
    pts = synthetic.render_scan(world, np.eye(4), cfg)
    good = np.isfinite(pts).all(-1)
    pad = np.where(good[:, None], pts, 0.0)[: cfg.max_raw_points]
    img = projection.project_scan(jnp.asarray(pad), jnp.asarray(good[: cfg.max_raw_points]), cfg)
    seg = segmentation.segment_scan(img, cfg)
    fc = features.extract_features(seg, cfg)
    n_sharp = int(np.asarray(fc.sharp_valid).sum())
    n_ls = int(np.asarray(fc.less_sharp_valid).sum())
    n_flat = int(np.asarray(fc.flat_valid).sum())
    n_lf = int(np.asarray(fc.less_flat_valid).sum())
    assert n_sharp > 5
    assert n_ls >= n_sharp
    assert n_flat > 20
    assert n_lf > 100
    # flats are ground points; sharps are not
    assert np.asarray(fc.sharp_ring)[np.asarray(fc.sharp_valid)].max() < cfg.n_scan


def test_occlusion_mask_matches_sequential_oracle():
    """Directional check: far-side points of an occlusion boundary are the
    ones suppressed (LO.cpp:209-216) — catches a reversed roll direction."""
    from reference_impls import occlusion_mark

    cfg = tiny_config().replace(ring_width=256)
    R, W = cfg.n_scan, 256
    rng = np.random.default_rng(11)
    base = np.cumsum(rng.uniform(-0.05, 0.05, (R, W)), axis=1) + 12
    jumps = rng.random((R, W)) < 0.05
    ranges = base + np.cumsum(jumps * rng.uniform(0.8, 4.0, (R, W)), axis=1) \
        - np.cumsum((rng.random((R, W)) < 0.05) * rng.uniform(0.8, 4.0, (R, W)), axis=1)
    ranges = np.abs(ranges) + 2.0
    cols = (np.arange(W)[None, :] * 2).astype(np.int64).repeat(R, 0).reshape(R, W)
    counts = np.full(R, W, np.int64)
    seg = _fake_seg(ranges, cols, np.zeros((R, W), bool), counts, cfg)

    got = np.asarray(features.occlusion_mask(seg, cfg))
    for i in range(R):
        want = occlusion_mark(ranges[i].astype(np.float32),
                              cols[i], int(counts[i]))
        # compare away from ring edges (vectorised version wraps; the
        # reference's flat loop also behaves differently within 6 of the ends)
        sl = slice(11, W - 12)
        np.testing.assert_array_equal(got[i][sl], want[sl], err_msg=f"ring {i}")
