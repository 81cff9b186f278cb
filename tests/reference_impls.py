"""Independent NumPy oracles mirroring the reference algorithms' semantics.

These are *re-implementations for testing only* (sequential, readable), used to
validate the vectorised TPU kernels: BFS component labelling with the angle
criterion (IP.cpp:306-412), sequential feature picking (LO.cpp:242-348), and a
dict-based voxel-grid centroid filter (pcl::VoxelGrid semantics).
"""

from __future__ import annotations

import numpy as np


def bfs_label_components(ranges: np.ndarray, segmentable: np.ndarray,
                         alpha_x: float, alpha_y: float, theta: float,
                         big_cluster: int = 30, valid_point_num: int = 5,
                         valid_line_num: int = 3):
    """Returns (labels, seg_ok, outlier) with the reference's BFS semantics."""
    R, H = ranges.shape
    labels = np.full((R, H), -1, np.int64)
    seg_ok = np.zeros((R, H), bool)
    outlier = np.zeros((R, H), bool)
    visited = ~segmentable.copy()
    comp_id = 0
    for si in range(R):
        for sj in range(H):
            if visited[si, sj]:
                continue
            stack = [(si, sj)]
            visited[si, sj] = True
            comp = []
            rows = set()
            while stack:
                i, j = stack.pop()
                comp.append((i, j))
                rows.add(i)
                for di, dj, alpha in ((-1, 0, alpha_y), (1, 0, alpha_y),
                                      (0, -1, alpha_x), (0, 1, alpha_x)):
                    ni, nj = i + di, (j + dj) % H
                    if ni < 0 or ni >= R or visited[ni, nj]:
                        continue
                    d1 = max(ranges[i, j], ranges[ni, nj])
                    d2 = min(ranges[i, j], ranges[ni, nj])
                    ang = np.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))
                    if ang > theta:
                        visited[ni, nj] = True
                        stack.append((ni, nj))
            ok = len(comp) >= big_cluster or (
                len(comp) >= valid_point_num and len(rows) >= valid_line_num)
            for (i, j) in comp:
                labels[i, j] = comp_id
                if ok:
                    seg_ok[i, j] = True
                else:
                    outlier[i, j] = True
            comp_id += 1
    return labels, seg_ok, outlier


def voxel_centroid(points: np.ndarray, leaf: float) -> np.ndarray:
    """pcl::VoxelGrid-style centroid downsample (floor binning)."""
    keys = np.floor(points / leaf).astype(np.int64)
    d = {}
    for p, k in zip(points, map(tuple, keys)):
        if k in d:
            d[k][0] += p
            d[k][1] += 1
        else:
            d[k] = [p.copy(), 1]
    return np.array([s / c for s, c in d.values()])


def sequential_feature_pick(curv: np.ndarray, col: np.ndarray, ground: np.ndarray,
                            valid: np.ndarray, picked0: np.ndarray,
                            n_sectors: int = 6, edge_thresh: float = 0.1,
                            max_sharp: int = 2, max_less_sharp: int = 20,
                            max_flat: int = 4, suppress: int = 5, col_gap: int = 10):
    """One ring of the reference's sector loop (LO.cpp:242-348).

    Inputs are ring-major compacted arrays of one ring (length W).  ``picked0``
    is the occlusion-marked initial neighbor_picked state.  Returns integer
    label per point: 2 sharp, 1 less-sharp, -1 flat, 0 none.
    """
    W = curv.shape[0]
    count = int(valid.sum())
    label = np.zeros(W, np.int64)
    picked = picked0.copy()
    start, end = 5, count - 1 - 5
    if end <= start:
        return label
    diff_idx = end - start
    for j in range(n_sectors):
        sp = start + j * diff_idx // n_sectors
        ep = start + (j + 1) * diff_idx // n_sectors - 1
        if sp >= ep:
            continue
        order = sorted(range(sp, ep + 1), key=lambda a: curv[a])

        def suppress_neighbors(idx):
            for l in range(1, suppress + 1):
                if idx + l >= W or abs(col[idx + l] - col[idx + l - 1]) > col_gap:
                    break
                picked[idx + l] = True
            for l in range(1, suppress + 1):
                if idx - l < 0 or abs(col[idx - l] - col[idx - l + 1]) > col_gap:
                    break
                picked[idx - l] = True

        picked_num = 0
        for k in reversed(order):
            if not picked[k] and curv[k] > edge_thresh and not ground[k]:
                picked_num += 1
                picked[k] = True
                if picked_num <= max_sharp:
                    label[k] = 2
                elif picked_num <= max_less_sharp:
                    label[k] = 1
                else:
                    break
                suppress_neighbors(k)

        picked_num = 0
        for k in order:
            if not picked[k] and curv[k] < edge_thresh and ground[k]:
                label[k] = -1
                picked_num += 1
                picked[k] = True
                if picked_num >= max_flat:
                    break
                suppress_neighbors(k)
    return label


def occlusion_mark(ranges: np.ndarray, cols: np.ndarray, n: int,
                   depth_jump: float = 0.5, col_gap: int = 10,
                   rel_diff: float = 0.02) -> np.ndarray:
    """Sequential occluded/parallel point marking for one ring
    (LO.cpp:200-229): when depth(i) - depth(i+1) > 0.5 the *far* side
    i-5..i is marked; when depth(i+1) - depth(i) > 0.5 the far side
    i+1..i+5 is marked; points with both neighbour range diffs > 2% of
    range are marked parallel."""
    W = len(ranges)
    picked = np.zeros(W, bool)
    for i in range(1, min(n - 1, W - 1)):
        depth1, depth2 = ranges[i], ranges[i + 1]
        if abs(int(cols[i]) - int(cols[i + 1])) < col_gap:
            if depth1 - depth2 > depth_jump:
                picked[max(i - 5, 0):i + 1] = True
            elif depth2 - depth1 > depth_jump:
                picked[i + 1:i + 6] = True
        diff1 = abs(ranges[i - 1] - depth1)
        diff2 = abs(depth2 - depth1)
        if diff1 > rel_diff * ranges[i] and diff2 > rel_diff * ranges[i]:
            picked[i] = True
    return picked
