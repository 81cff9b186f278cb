"""Range-image projection and ground removal (stage-1 front half).

TPU-native re-design of the reference's per-point loops
(``/root/reference/src/IP.cpp:106-239``): the scan is a fixed-capacity masked
point array, the row/column binning is fully vectorised (including the
RFANS-16M piecewise vertical-angle table, IP.cpp:138-177), and the scatter into
the 16 x 4000 range image resolves duplicate pixels with a min-range rule
(deterministic; the reference's "last write wins" depends on point order).
Ground removal (IP.cpp:203-239) becomes a shifted-array comparison over the
bottom ``ground_scan_id`` rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, LaserType

RAD2DEG = 180.0 / jnp.pi
INVALID_RANGE = 1e9  # stands in for the reference's DBL_MAX empty-pixel marker


class RangeImage(NamedTuple):
    """Dense per-pixel scan representation, shapes [n_scan, horizon_scan]."""

    points: jnp.ndarray   # [R, H, 3] xyz of the point filling each pixel
    ranges: jnp.ndarray   # [R, H] range; INVALID_RANGE where empty
    valid: jnp.ndarray    # [R, H] bool pixel occupied
    ground: jnp.ndarray   # [R, H] bool ground-labelled
    # sweep orientation metadata (IP.cpp:120-130); defaulted so tests can
    # fabricate images without it (uniform-spin assumption)
    orient_start: jnp.ndarray = np.float32(0.0)   # sweep start orientation
    orient_diff: jnp.ndarray = np.float32(2 * np.pi)  # end - start, (pi, 3pi]


def rfans_row_id(vert_deg: jnp.ndarray) -> jnp.ndarray:
    """Piecewise nonuniform vertical angle -> ring for RFANS_16M (IP.cpp:144-171).

    Bands (top to bottom): >4.5deg -> 3deg spacing from ring 13; (0.5, 4.5] ->
    2deg spacing from ring 11; (-7, 0.5] -> 1deg spacing; then three fixed
    rings and ring 0 below -13.5deg.
    """
    # NB: C truncation `int(x + 0.5)` == floor for the positive operands here.
    r_hi = jnp.floor(13 + (vert_deg - 5.0) / 3 + 0.5)
    r_mid = jnp.floor(11 + (vert_deg - 1.0) / 2 + 0.5)
    r_low = jnp.floor(10.5 + vert_deg)  # int truncation of positive 10.5+v
    row = jnp.where(
        vert_deg > 4.5, r_hi,
        jnp.where(
            vert_deg > 0.5, r_mid,
            jnp.where(
                vert_deg > -7.0, r_low,
                jnp.where(vert_deg > -8.5, 3.0,
                          jnp.where(vert_deg > -10.5, 2.0,
                                    jnp.where(vert_deg > -13.5, 1.0, 0.0))))))
    return row.astype(jnp.int32)


def uniform_row_id(vert_deg: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    """Uniform ring formula for LSLIDAR_C16 (IP.cpp:140)."""
    return jnp.floor((vert_deg + cfg.ang_bottom_deg) / cfg.ang_res_y_deg + 0.5).astype(jnp.int32)


def project_scan(points: jnp.ndarray, mask: jnp.ndarray, cfg: PipelineConfig) -> RangeImage:
    """Project a masked point set [N, 3] onto the dense range image.

    Mirrors IP.cpp:134-201: vertical angle -> ring, horizontal angle -> column,
    range fill; plus the close-point filter (IP.cpp:117) folded in as a mask.
    """
    R, H = cfg.n_scan, cfg.horizon_scan
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    rng = jnp.sqrt(x * x + y * y + z * z)
    mask = mask & (rng >= cfg.min_range) & jnp.isfinite(rng)

    vert_deg = jnp.arctan2(z, jnp.hypot(x, y)) * RAD2DEG
    if cfg.laser_type == LaserType.RFANS_16M:
        row = rfans_row_id(vert_deg)
    else:
        row = uniform_row_id(vert_deg, cfg)

    horizon_deg = (-jnp.arctan2(y, x) + 2 * jnp.pi) * RAD2DEG
    col = jnp.floor(horizon_deg / cfg.ang_res_x_deg).astype(jnp.int32)
    col = jnp.where(col >= H, col - H, col)

    ok = mask & (row >= 0) & (row < R) & (col >= 0) & (col < H)
    flat_idx = jnp.where(ok, row * H + col, R * H)  # out-of-range -> dropped bin

    # sweep start/end orientation from the first/last point in ARRIVAL order
    # (IP.cpp:120-130): for a real sensor the cloud arrives in firing order,
    # so these bracket the actual spin; carried through SegmentedScan so
    # de-skew can use true per-point time instead of the uniform col proxy
    n = mask.shape[0]
    first = jnp.argmax(mask)
    last = n - 1 - jnp.argmax(mask[::-1])
    start_ori = -jnp.arctan2(y[first], x[first])
    end_ori = -jnp.arctan2(y[last], x[last]) + 2 * jnp.pi
    d = end_ori - start_ori
    end_ori = jnp.where(d > 3 * jnp.pi, end_ori - 2 * jnp.pi,
                        jnp.where(d < jnp.pi, end_ori + 2 * jnp.pi, end_ori))
    orient_start = jnp.where(mask.any(), start_ori, 0.0)
    orient_diff = jnp.where(mask.any(), end_ori - start_ori, 2 * jnp.pi)

    # Last-write-wins scatter for range AND coordinates — the reference's
    # exact duplicate-pixel rule (IP.cpp:196-200), and gather-free (a win
    # check would need a 64k random gather, the slowest TPU primitive).
    ranges = jnp.full((R * H + 1,), INVALID_RANGE, points.dtype)
    ranges = ranges.at[flat_idx].set(jnp.where(ok, rng, INVALID_RANGE),
                                     mode="drop")
    ranges_img = ranges[: R * H].reshape(R, H)
    valid = ranges_img < INVALID_RANGE * 0.5

    pts_img = jnp.zeros((R * H + 1, 3), points.dtype)
    pts_img = pts_img.at[flat_idx].set(jnp.where(ok[..., None], points, 0.0),
                                       mode="drop")
    pts_img = pts_img[: R * H].reshape(R, H, 3)

    ground = ground_mask(pts_img, valid, cfg)
    return RangeImage(points=pts_img, ranges=ranges_img, valid=valid,
                      ground=ground, orient_start=orient_start,
                      orient_diff=orient_diff)


def ground_mask(pts: jnp.ndarray, valid: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    """Inter-ring slope test over the bottom rings (IP.cpp:203-228).

    For ring i in [0, ground_scan_id): if both pixels (i, j) and (i+1, j) are
    occupied and the elevation of their difference vector is within 10 deg of
    the mount angle, both are ground.
    """
    g = cfg.ground_scan_id
    lower = pts[:g]           # rings 0..g-1
    upper = pts[1 : g + 1]    # rings 1..g
    ok = valid[:g] & valid[1 : g + 1]
    d = upper - lower
    ang = jnp.arctan2(d[..., 2], jnp.hypot(d[..., 0], d[..., 1])) * RAD2DEG
    hit = ok & (jnp.abs(ang - cfg.sensor_mount_ang_deg) < cfg.ground_angle_thresh_deg)

    ground = jnp.zeros(valid.shape, bool)
    ground = ground.at[:g].set(hit)
    ground = ground.at[1 : g + 1].set(ground[1 : g + 1] | hit)
    return ground & valid
