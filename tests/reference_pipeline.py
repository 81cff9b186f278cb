"""Sequential NumPy oracle of the COMPOSED reference front end + odometry.

A readable, loop-based re-implementation of the reference dataflow
(projection IP.cpp:106-301 -> BFS segmentation IP.cpp:306-412 -> compaction
IP.cpp:254-287 -> curvature/occlusion/picking LO.cpp:187-365 -> two-step
scan-to-scan odometry LO.cpp:398-583) used to validate the JAX pipeline's
*composition*, not just its kernels.  Everything runs in f64.

Intentional scope notes (differences from bit-level reference behaviour,
shared with the JAX pipeline):
* the solver is Gauss-Newton + Huber IRLS with the reference's Jacobian
  column masking, not Ceres LM (same residuals/Jacobians, LO.cpp:483-574);
* duplicate range-image pixels resolve min-range (deterministic) rather than
  last-write (arrival-order dependent);
* per-ring layout instead of the flat segmented cloud + ring index ranges
  (equivalent: reference feature windows never cross rings).
"""

from __future__ import annotations

import numpy as np

from reference_impls import (bfs_label_components, occlusion_mark,
                             sequential_feature_pick, voxel_centroid)


# ---------------------------------------------------------------------------
# stage 1: projection + ground + segmentation + compaction
# ---------------------------------------------------------------------------

def project(points: np.ndarray, cfg):
    """Range image fill (IP.cpp:134-201) with min-range duplicate rule."""
    R, H = cfg.n_scan, cfg.horizon_scan
    pts = points[np.isfinite(points).all(-1)]
    rng = np.linalg.norm(pts, axis=1)
    keep = rng >= cfg.min_range
    pts, rng = pts[keep], rng[keep]

    vert = np.degrees(np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1])))
    if int(cfg.laser_type) == 1:          # RFANS_16M piecewise table
        row = np.where(
            vert > 4.5, np.floor(13 + (vert - 5.0) / 3 + 0.5),
            np.where(vert > 0.5, np.floor(11 + (vert - 1.0) / 2 + 0.5),
                     np.where(vert > -7.0, np.floor(10.5 + vert),
                              np.where(vert > -8.5, 3.0,
                                       np.where(vert > -10.5, 2.0,
                                                np.where(vert > -13.5, 1.0,
                                                         0.0)))))).astype(int)
    else:
        row = np.floor((vert + cfg.ang_bottom_deg) / cfg.ang_res_y_deg
                       + 0.5).astype(int)
    horiz = np.degrees(-np.arctan2(pts[:, 1], pts[:, 0]) + 2 * np.pi)
    col = np.floor(horiz / cfg.ang_res_x_deg).astype(int)
    col = np.where(col >= H, col - H, col)
    ok = (row >= 0) & (row < R) & (col >= 0) & (col < H)

    ranges = np.full((R, H), np.inf)
    img = np.zeros((R, H, 3))
    for p, rg, i, j, o in zip(pts, rng, row, col, ok):
        if o and rg < ranges[i, j]:
            ranges[i, j] = rg
            img[i, j] = p
    valid = np.isfinite(ranges)
    return img, ranges, valid


def ground(img, valid, cfg):
    """Bottom-ring slope test (IP.cpp:203-228)."""
    g = np.zeros(valid.shape, bool)
    for i in range(cfg.ground_scan_id):
        for j in range(valid.shape[1]):
            if not (valid[i, j] and valid[i + 1, j]):
                continue
            d = img[i + 1, j] - img[i, j]
            ang = np.degrees(np.arctan2(d[2], np.hypot(d[0], d[1])))
            if abs(ang - cfg.sensor_mount_ang_deg) < cfg.ground_angle_thresh_deg:
                g[i, j] = g[i + 1, j] = True
    return g & valid


def stage1(points: np.ndarray, cfg):
    """Full stage 1: returns per-ring compacted dict + outlier cloud."""
    img, ranges, valid = project(points, cfg)
    gnd = ground(img, valid, cfg)
    segmentable = valid & ~gnd
    _, seg_ok, outlier_px = bfs_label_components(
        np.where(valid, ranges, np.inf), segmentable,
        cfg.ang_res_x, cfg.ang_res_y, cfg.seg_theta,
        cfg.seg_big_cluster, cfg.seg_valid_point_num, cfg.seg_valid_line_num)

    R, H = valid.shape
    rings = []
    outliers = []
    for i in range(R):
        pts_i, rng_i, col_i, gnd_i = [], [], [], []
        for j in range(H):
            if not (seg_ok[i, j] or (gnd[i, j] and valid[i, j])):
                # failed-segment pixels -> subsampled outlier cloud
                # (IP.cpp:263-269; ground is never segmentable, so outlier
                # and ground are disjoint)
                if outlier_px[i, j] and i > cfg.ground_scan_id \
                        and j % cfg.outlier_subsample == 0:
                    outliers.append(img[i, j])
                continue
            if gnd[i, j] and (j % cfg.ground_subsample != 0
                              and 4 < j < H - 5):
                continue
            pts_i.append(img[i, j])
            rng_i.append(ranges[i, j])
            col_i.append(j)
            gnd_i.append(bool(gnd[i, j]))
        rings.append(dict(
            pts=np.asarray(pts_i).reshape(-1, 3),
            rng=np.asarray(rng_i, float),
            col=np.asarray(col_i, int),
            gnd=np.asarray(gnd_i, bool)))
    out = (np.stack(outliers) if outliers else np.zeros((0, 3)))
    return rings, out


# ---------------------------------------------------------------------------
# stage 2 front half: curvature + occlusion + picking (LO.cpp:187-365)
# ---------------------------------------------------------------------------

def features(rings, cfg):
    sharp, less_sharp, flat, less_flat = [], [], [], []
    for ring_id, ring in enumerate(rings):
        n = len(ring["rng"])
        if n < 12:
            continue
        r = ring["rng"]
        curv = np.zeros(n)
        for k in range(5, n - 5):
            curv[k] = (r[k - 5:k + 6].sum() - 11 * r[k]) ** 2
        picked0 = occlusion_mark(r, ring["col"], n,
                                 cfg.occl_depth_jump, cfg.occl_col_gap,
                                 cfg.parallel_rel_diff)
        valid = np.ones(n, bool)
        label = sequential_feature_pick(
            curv, ring["col"], ring["gnd"], valid, picked0,
            cfg.n_sectors, cfg.edge_curv_thresh, cfg.max_sharp_per_sector,
            cfg.max_less_sharp_per_sector, cfg.max_flat_per_sector,
            cfg.suppress_neighbors, cfg.suppress_col_gap)
        for k in range(n):
            p = (ring["pts"][k], ring_id)
            if label[k] == 2:
                sharp.append(p)
                less_sharp.append(p)
            elif label[k] == 1:
                less_sharp.append(p)
            elif label[k] == -1:
                flat.append(p)
        # less-flat: label <= 0 within the feature window, voxel-filtered
        lf = np.asarray([ring["pts"][k] for k in range(5, max(n - 6, 5))
                         if label[k] <= 0]).reshape(-1, 3)
        if len(lf):
            for c in voxel_centroid(lf, cfg.less_flat_leaf):
                less_flat.append((c, ring_id))
    def pack(lst):
        if not lst:
            return np.zeros((0, 3)), np.zeros(0, int)
        return (np.stack([p for p, _ in lst]),
                np.asarray([r for _, r in lst], int))
    return dict(zip(
        ("sharp", "sharp_ring", "less_sharp", "less_sharp_ring",
         "flat", "flat_ring", "less_flat", "less_flat_ring"),
        pack(sharp) + pack(less_sharp) + pack(flat) + pack(less_flat)))


# ---------------------------------------------------------------------------
# stage 2 back half: two-step scan-to-scan odometry (LO.cpp:398-583)
# ---------------------------------------------------------------------------

def _rpy_to_rot(rpy):
    r, p, y = rpy
    Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)],
                   [0, np.sin(r), np.cos(r)]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0],
                   [-np.sin(p), 0, np.cos(p)]])
    Rz = np.array([[np.cos(y), -np.sin(y), 0],
                   [np.sin(y), np.cos(y), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _transform(params, p):
    return _rpy_to_rot(params[3:]) @ p + params[:3]


def _surf_correspondences(params, flat, flat_ring, surf_prev, ring_prev, cfg):
    """LO.cpp:408-478: nearest + same-ring 2nd + nearby-other-ring 3rd."""
    out = []
    if len(surf_prev) == 0:
        return out
    for q, qr in zip(flat, flat_ring):
        sel = _transform(params, q)
        d2 = np.sum((surf_prev - sel) ** 2, 1)
        c = int(np.argmin(d2))
        if d2[c] >= cfg.nearest_feature_dist_sq:
            continue
        cs = ring_prev[c]
        near = np.abs(ring_prev - cs) <= cfg.ring_search_span
        same = near & (ring_prev == cs)
        other = near & (ring_prev != cs)
        same[c] = False
        best2 = best3 = -1
        m2 = m3 = cfg.nearest_feature_dist_sq
        for k in np.nonzero(same)[0]:
            if d2[k] < m2:
                m2, best2 = d2[k], k
        for k in np.nonzero(other)[0]:
            if d2[k] < m3:
                m3, best3 = d2[k], k
        if best2 >= 0 and best3 >= 0:
            out.append((q, surf_prev[c], surf_prev[best2], surf_prev[best3]))
    return out


def _corner_correspondences(params, sharp, sharp_ring, corner_prev,
                            ring_prev, cfg):
    """LO.cpp:498-552: nearest + best point on a DIFFERENT nearby ring."""
    out = []
    if len(corner_prev) == 0:
        return out
    for q, qr in zip(sharp, sharp_ring):
        sel = _transform(params, q)
        d2 = np.sum((corner_prev - sel) ** 2, 1)
        c = int(np.argmin(d2))
        if d2[c] >= cfg.nearest_feature_dist_sq:
            continue
        cs = ring_prev[c]
        other = (np.abs(ring_prev - cs) <= cfg.ring_search_span) \
            & (ring_prev != cs)
        best2, m2 = -1, cfg.nearest_feature_dist_sq
        for k in np.nonzero(other)[0]:
            if d2[k] < m2:
                m2, best2 = d2[k], k
        if best2 >= 0:
            out.append((q, corner_prev[c], corner_prev[best2]))
    return out


def _drot_drpy(rpy, p):
    """Exact d(R(rpy) p)/d(rpy), finite-difference-free."""
    eps = 1e-7
    J = np.zeros((3, 3))
    for a in range(3):
        d = np.zeros(3)
        d[a] = eps
        J[:, a] = (_rpy_to_rot(rpy + d) @ p - _rpy_to_rot(rpy - d) @ p) / (2 * eps)
    return J


def _gn_solve(params, surf_corr, corner_corr, dims, iters, cfg):
    """Masked GN + Huber IRLS, mirroring ops/gauss_newton in f64."""
    params = params.copy()
    for _ in range(iters):
        rows, jacs, ws = [], [], []
        for (q, pj, pl, pm) in surf_corr:
            lp = _transform(params, q)
            n = np.cross(pj - pl, pj - pm)
            nn = np.linalg.norm(n) + 1e-9
            signed = np.dot(lp - pj, n) / nn
            r = abs(signed)
            dr_dlp = np.sign(signed) * n / nn
            J = np.concatenate([dr_dlp, dr_dlp @ _drot_drpy(params[3:], q)])
            J = J * np.array([0, 0, 1, 0, 0, 0.0])   # surf: z only
            rows.append(r); jacs.append(J); ws.append(1.0)
        for (q, pj, pl) in corner_corr:
            lp = _transform(params, q)
            u, v, w = lp - pj, lp - pl, pj - pl
            k = np.linalg.norm(w) + 1e-9
            cvec = np.cross(u, v)
            m = np.linalg.norm(cvec) + 1e-9
            r = m / k
            dm_dlp = np.cross(w, cvec) / m
            J = np.concatenate([dm_dlp, dm_dlp @ _drot_drpy(params[3:], q)]) / k
            J = J * np.array([1, 1, 0, 0, 0, 1.0])   # corner: x, y, yaw
            rows.append(r); jacs.append(J); ws.append(1.0)
        if not rows:
            return params
        r = np.asarray(rows)
        J = np.stack(jacs)
        hw = np.where(np.abs(r) <= cfg.huber_delta, 1.0,
                      cfg.huber_delta / np.maximum(np.abs(r), 1e-12))
        w = np.asarray(ws) * hw
        H = J.T @ (J * w[:, None])
        g = (J * w[:, None]).T @ r
        m = dims.astype(float)
        H = H * np.outer(m, m) + np.diag(1.0 - m) + 1e-6 * np.eye(6)
        g = g * m
        delta = -np.linalg.solve(H, g)
        params = params + delta
        if np.abs(delta).max() < 1e-4:
            break
    return params


def run_reference_odometry(pts_seq, cfg):
    """Composed pipeline over a sequence -> odometry poses [N, 4, 4]."""
    SURF = np.array([0, 0, 1, 0, 0, 0], bool)
    STEPB = np.array([1, 1, 1, 0, 0, 1], bool)
    params = np.zeros(6)
    t_w = np.zeros(3)
    R_w = np.eye(3)
    prev = None
    poses = []
    for pts in pts_seq:
        rings, _ = stage1(np.asarray(pts, float), cfg)
        fc = features(rings, cfg)
        if prev is not None:
            surf_corr = _surf_correspondences(
                params, fc["flat"], fc["flat_ring"],
                prev["less_flat"], prev["less_flat_ring"], cfg)
            if len(surf_corr) >= cfg.min_correspondences:
                params = _gn_solve(params, surf_corr, [], SURF,
                                   cfg.odom_surf_iters, cfg)
            corner_corr = _corner_correspondences(
                params, fc["sharp"], fc["sharp_ring"],
                prev["less_sharp"], prev["less_sharp_ring"], cfg)
            if len(corner_corr) >= cfg.min_correspondences:
                params = _gn_solve(params, surf_corr, corner_corr, STEPB,
                                   cfg.odom_corner_iters, cfg)
            # yaw-only integration (LO.cpp:579-583)
            t_w = t_w + R_w @ params[:3]
            cy, sy = np.cos(params[5]), np.sin(params[5])
            R_w = R_w @ np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        prev = fc
        T = np.eye(4)
        T[:3, :3] = R_w
        T[:3, 3] = t_w
        poses.append(T)
    return np.stack(poses)
