import numpy as np
import jax.numpy as jnp

from alego_tpu.config import tiny_config, LaserType
from alego_tpu.ops import projection
from alego_tpu.utils import synthetic


def test_rfans_row_table():
    # mirror the piecewise branches of IP.cpp:144-171 in plain python
    def ref(v):
        if v > 4.5:
            return int(13 + (v - 5.0) / 3 + 0.5)
        if v > 0.5:
            return int(11 + (v - 1.0) / 2 + 0.5)
        if v > -7.0:
            return int(10.5 + v)
        if v > -8.5:
            return 3
        if v > -10.5:
            return 2
        if v > -13.5:
            return 1
        return 0

    v = np.linspace(-16.0, 7.0, 400)
    got = np.asarray(projection.rfans_row_id(jnp.asarray(v)))
    want = np.array([ref(x) for x in v])
    np.testing.assert_array_equal(got, want)


def test_projection_recovers_ring_and_col():
    cfg = tiny_config()
    world = synthetic.make_world(seed=1)
    pose = np.eye(4)
    pts = synthetic.render_scan(world, pose, cfg)
    good = np.isfinite(pts).all(-1)
    pts_clean = np.where(good[:, None], pts, 0.0)[: cfg.max_raw_points]
    mask = good[: cfg.max_raw_points]

    img = projection.project_scan(jnp.asarray(pts_clean), jnp.asarray(mask), cfg)
    valid = np.asarray(img.valid)
    assert valid.sum() > 1000
    # each valid pixel's stored point must reproduce its own row/col
    rng_img = np.asarray(img.ranges)
    p = np.asarray(img.points)
    r = np.linalg.norm(p, axis=-1)
    np.testing.assert_allclose(r[valid], rng_img[valid], rtol=1e-4)


def test_ground_detected_on_plane():
    cfg = tiny_config()
    world = synthetic.make_world(seed=2, n_boxes=0, n_cyl=0)
    pts = synthetic.render_scan(world, np.eye(4), cfg)
    good = np.isfinite(pts).all(-1)
    pts_clean = np.where(good[:, None], pts, 0.0)[: cfg.max_raw_points]
    img = projection.project_scan(jnp.asarray(pts_clean),
                                  jnp.asarray(good[: cfg.max_raw_points]), cfg)
    ground = np.asarray(img.ground)
    valid = np.asarray(img.valid)
    # on a pure ground plane almost every valid pixel in the bottom rings is ground
    bottom = valid[: cfg.ground_scan_id]
    frac = ground[: cfg.ground_scan_id][bottom].mean()
    assert frac > 0.95
    # rays in the top rings never hit the plane
    assert valid[cfg.ground_scan_id + 2 :].sum() == 0


def test_min_range_filter():
    cfg = tiny_config()
    pts = np.array([[0.2, 0.0, 0.0], [5.0, 0.0, -1.0]], np.float32)
    pad = np.zeros((cfg.max_raw_points, 3), np.float32)
    pad[:2] = pts
    mask = np.zeros(cfg.max_raw_points, bool)
    mask[:2] = True
    img = projection.project_scan(jnp.asarray(pad), jnp.asarray(mask), cfg)
    assert int(np.asarray(img.valid).sum()) == 1
