"""Scan-to-map matching + keyframe management + loop closure (C12/C13).

Re-design of ``/root/reference/src/LM.cpp`` as fixed-shape jittable steps:

* the growing ``corner_frames_/surf_frames_/outlier_frames_`` vectors become
  fixed-capacity keyframe arrays (the "unbounded map growth" of SURVEY §5.7
  bounded by ``max_keyframes``);
* ``extractSurroundingKeyFrames`` (LM.cpp:339-468, loop-closure mode) becomes
  a batched gather+transform of the last 50 keyframes and a voxel-grid merge;
* ``scan2MapOptimization`` (LM.cpp:493-624) keeps the reference's exact
  structure — 2 outer association passes, 5-NN with 1 m gate, PCA line test
  (l2 > 3*l1), QR plane fit with 0.2 m validity, then 20 full-6DoF GN
  iterations with Huber(0.1) — but every fit/residual is batched;
* ``saveKeyFramesAndFactor`` / ``correctPoses`` / ``transformUpdate``
  (LM.cpp:636-730) map onto the PoseGraph module; the full GN solve runs on
  loop closures, matching where iSAM2 does real work in the reference;
* the 1 Hz loop-closure thread (LM.cpp:779-903) becomes ``loop_closure_step``
  invoked by the pipeline on a keyframe cadence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops import se3
from ..ops.knn import knn_best as knn
from ..ops.voxel import voxel_downsample, voxel_downsample_exact, compact_masked
from ..ops.eig3 import pca_line_fit, plane_fit
from ..ops.residuals import point_to_line, point_to_plane_fitted
from ..ops.gauss_newton import solve_gn, FULL_DIMS
from ..ops.icp import icp_point_to_point, ICPResult
from . import pose_graph as pg


class MappingState(NamedTuple):
    graph: pg.PoseGraph
    kf_times: jnp.ndarray        # [MAX_KF]
    kf_corner: jnp.ndarray       # [MAX_KF, KC, 3] (laser frame)
    kf_corner_valid: jnp.ndarray
    kf_surf: jnp.ndarray         # [MAX_KF, KS, 3]
    kf_surf_valid: jnp.ndarray
    kf_outlier: jnp.ndarray      # [MAX_KF, KO, 3]
    kf_outlier_valid: jnp.ndarray
    T_map2odom: jnp.ndarray      # [4, 4]
    T_map2laser: jnp.ndarray     # [4, 4]
    last_loop_kf: jnp.ndarray    # int32: keyframe index of last loop attempt
    loop_attempts: jnp.ndarray   # int32: ICP attempts run (diagnostics)
    loop_best_fitness: jnp.ndarray  # float: min ICP fitness seen (diagnostics)
    loop_best_inlier: jnp.ndarray   # float: max inlier fraction seen
    # cached voxel-merged local map (the reference caches transformed
    # keyframe clouds in its deque, LM.cpp:361-388); dirty on keyframe/loop
    map_corner: jnp.ndarray      # [map_corner_cap, 3]
    map_corner_valid: jnp.ndarray
    map_surf: jnp.ndarray        # [map_surf_cap, 3]
    map_surf_valid: jnp.ndarray
    map_dirty: jnp.ndarray       # bool


def init_state(cfg: PipelineConfig, dtype=jnp.float32) -> MappingState:
    M = cfg.max_keyframes
    assert M >= cfg.recent_keyframe_search_num, (
        "max_keyframes must cover the recent-keyframe window "
        f"({M} < {cfg.recent_keyframe_search_num})")
    return MappingState(
        graph=pg.init_graph(M, cfg.max_loop_factors, dtype),
        kf_times=jnp.zeros(M, dtype),
        kf_corner=jnp.zeros((M, cfg.kf_corner_cap, 3), dtype),
        kf_corner_valid=jnp.zeros((M, cfg.kf_corner_cap), bool),
        kf_surf=jnp.zeros((M, cfg.kf_surf_cap, 3), dtype),
        kf_surf_valid=jnp.zeros((M, cfg.kf_surf_cap), bool),
        kf_outlier=jnp.zeros((M, cfg.kf_outlier_cap, 3), dtype),
        kf_outlier_valid=jnp.zeros((M, cfg.kf_outlier_cap), bool),
        T_map2odom=jnp.eye(4, dtype=dtype),
        T_map2laser=jnp.eye(4, dtype=dtype),
        last_loop_kf=jnp.int32(-1),
        loop_attempts=jnp.int32(0),
        loop_best_fitness=jnp.asarray(jnp.inf, dtype),
        loop_best_inlier=jnp.asarray(0.0, dtype),
        map_corner=jnp.zeros((cfg.map_corner_cap, 3), dtype),
        map_corner_valid=jnp.zeros(cfg.map_corner_cap, bool),
        map_surf=jnp.zeros((cfg.map_surf_cap, 3), dtype),
        map_surf_valid=jnp.zeros(cfg.map_surf_cap, bool),
        map_dirty=jnp.bool_(False),
    )


def _transform_kf_clouds(poses, pts, valid):
    """Batch-transform [K, cap, 3] clouds by [K, 4, 4] poses."""
    out = jnp.einsum("kij,kpj->kpi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    return jnp.where(valid[..., None], out, 0.0)


def _build_local_map(ms: MappingState, cfg: PipelineConfig,
                     T_pred: jnp.ndarray | None = None):
    """Local feature map, voxel-merged (LM.cpp:339-468).

    Loop-closure mode (default): the last ``recent_keyframe_search_num``
    keyframes — a contiguous window, fetched with ``dynamic_slice``
    (LM.cpp:351-388).  Radius mode (``loop_closure_enabled=False``): the K
    nearest keyframes within ``surround_keyframe_search_radius`` of the
    predicted pose (LM.cpp:390-458), selected by top-k and row-gathered.
    """
    K = cfg.recent_keyframe_search_num
    count = ms.graph.count

    if cfg.loop_closure_enabled or T_pred is None:
        start = jnp.clip(count - K, 0, cfg.max_keyframes - K)
        raw_idx = jnp.arange(K, dtype=jnp.int32) + start
        kf_ok = (raw_idx < count) & (count > 0)

        def slc(a):
            return jax.lax.dynamic_slice_in_dim(a, start, K, axis=0)

        poses = slc(ms.graph.poses)
        sel_corner = slc(ms.kf_corner)
        sel_surf = slc(ms.kf_surf)
        sel_outlier = slc(ms.kf_outlier)
        c_valid = slc(ms.kf_corner_valid) & kf_ok[:, None]
        s_valid = slc(ms.kf_surf_valid) & kf_ok[:, None]
        o_valid = slc(ms.kf_outlier_valid) & kf_ok[:, None]
    else:
        cur = T_pred[:3, 3]
        kp = ms.graph.poses[:, :3, 3]
        idx_all = jnp.arange(cfg.max_keyframes)
        act = (idx_all < count)
        d2 = jnp.sum((kp - cur) ** 2, -1)
        r2 = cfg.surround_keyframe_search_radius ** 2
        elig = act & (d2 < r2)
        score = jnp.where(elig, -d2, -1e30)
        _, sel = jax.lax.top_k(score, K)          # K nearest eligible
        kf_ok = elig[sel]
        poses = ms.graph.poses[sel]
        sel_corner = ms.kf_corner[sel]
        sel_surf = ms.kf_surf[sel]
        sel_outlier = ms.kf_outlier[sel]
        c_valid = ms.kf_corner_valid[sel] & kf_ok[:, None]
        s_valid = ms.kf_surf_valid[sel] & kf_ok[:, None]
        o_valid = ms.kf_outlier_valid[sel] & kf_ok[:, None]

    c_pts = _transform_kf_clouds(poses, sel_corner, c_valid)
    s_pts = _transform_kf_clouds(poses, sel_surf, s_valid)
    o_pts = _transform_kf_clouds(poses, sel_outlier, o_valid)

    map_corner, map_corner_valid = voxel_downsample(
        c_pts.reshape(-1, 3), c_valid.reshape(-1), cfg.corner_leaf,
        cfg.map_corner_cap)
    # surf map includes outliers (LM.cpp:385-387)
    surf_all = jnp.concatenate([s_pts.reshape(-1, 3), o_pts.reshape(-1, 3)], 0)
    surf_all_valid = jnp.concatenate([s_valid.reshape(-1), o_valid.reshape(-1)], 0)
    map_surf, map_surf_valid = voxel_downsample(
        surf_all, surf_all_valid, cfg.surf_leaf, cfg.map_surf_cap)
    return map_corner, map_corner_valid, map_surf, map_surf_valid


def _downsample_scan(corner_pts, corner_valid, surf_pts, surf_valid,
                     outlier_pts, outlier_valid, cfg: PipelineConfig):
    """downsampleCurrentScan (LM.cpp:470-491)."""
    c_ds, c_ok = voxel_downsample_exact(corner_pts, corner_valid,
                                        cfg.corner_leaf, cfg.kf_corner_cap)
    s_ds, s_ok = voxel_downsample_exact(surf_pts, surf_valid, cfg.surf_leaf,
                                        cfg.kf_surf_cap)
    o_ds, o_ok = voxel_downsample_exact(outlier_pts, outlier_valid,
                                        cfg.outlier_leaf, cfg.kf_outlier_cap)
    total = jnp.concatenate([s_ds, o_ds], 0)
    total_ok = jnp.concatenate([s_ok, o_ok], 0)
    st_ds, st_ok = voxel_downsample_exact(total, total_ok, cfg.surf_leaf,
                                          cfg.kf_surf_cap + cfg.kf_outlier_cap)
    return c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok


def _default_assoc(cfg: PipelineConfig):
    """5-NN association returning neighbour COORDS (single-device path)."""

    def assoc(sel, ok, mpts, mok):
        d, i = knn(sel, ok, mpts, mok, cfg.map_knn, chunk=cfg.knn_chunk)
        return d, mpts[i]

    return assoc


def _scan_to_map(params0, c_ds, c_ok, st_ds, st_ok,
                 map_c, map_c_ok, map_s, map_s_ok, cfg: PipelineConfig,
                 assoc=None):
    """scan2MapOptimization (LM.cpp:493-624): association + full-6DoF GN.

    ``assoc(sel, ok, map_pts, map_ok) -> (d2 [Q, k], nbrs [Q, k, 3])`` is
    pluggable: the default searches a local map; parallel/sharded_mapping
    supplies the mesh-sharded search (coords come back with the candidates,
    so no global gather against a sharded store is ever needed)."""
    if assoc is None:
        assoc = _default_assoc(cfg)
    enough = ((jnp.sum(c_ok) >= cfg.min_corner_for_map)
              & (jnp.sum(st_ok) >= cfg.min_surf_for_map)
              & (jnp.sum(map_c_ok) >= cfg.min_corner_for_map))

    def outer(_, params):
        # corner: 5-NN + PCA line test (LM.cpp:516-562)
        sel_c = se3.transform_points(params, c_ds)
        d_c, nbrs = assoc(sel_c, c_ok, map_c, map_c_ok)
        near_c = c_ok & (d_c[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        center, direction, ev = pca_line_fit(nbrs, jnp.ones_like(d_c, bool))
        is_line = ev[:, 2] > cfg.line_eig_ratio * ev[:, 1]
        pj = center + 0.1 * direction
        pl = center - 0.1 * direction
        w_line = (near_c & is_line).astype(params.dtype)

        # surf: 5-NN + plane fit (LM.cpp:564-607)
        sel_s = se3.transform_points(params, st_ds)
        d_s, nbrs_s = assoc(sel_s, st_ok, map_s, map_s_ok)
        near_s = st_ok & (d_s[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        unit_n, d0, plane_ok = plane_fit(nbrs_s, jnp.ones_like(d_s, bool),
                                         cfg.plane_fit_tol)
        w_plane = (near_s & plane_ok).astype(params.dtype)

        def res_fn(p):
            r_c, J_c = point_to_line(p, c_ds, pj, pl)
            r_s, J_s = point_to_plane_fitted(p, st_ds, unit_n, d0)
            r = jnp.concatenate([r_c, r_s])
            J = jnp.concatenate([J_c, J_s])
            w = jnp.concatenate([w_line, w_plane])
            return r, J, w

        return solve_gn(res_fn, params, cfg.map_gn_iters, FULL_DIMS,
                        cfg.huber_delta, param_tol=cfg.map_gn_tol,
                        eig_floor=cfg.map_eig_floor)

    params = jax.lax.fori_loop(0, cfg.map_outer_iters, outer, params0)
    return jnp.where(enough, params, params0)


def mapping_step(ms: MappingState, T_odom2laser: jnp.ndarray,
                 corner_pts, corner_valid, surf_pts, surf_valid,
                 outlier_pts, outlier_valid, time: jnp.ndarray,
                 cfg: PipelineConfig, assoc=None):
    """One mapping frame. Returns (new_state, T_map2laser).

    ``assoc``: optional distributed association (see _scan_to_map)."""
    # transformAssociateToMap (LM.cpp:333-337)
    T_pred = ms.T_map2odom @ T_odom2laser

    # the rebuild cond carries ONLY the four local-map buffers (~0.4 MiB):
    # routing the whole MappingState through lax.cond puts the 100+ MiB
    # keyframe store on the cond's output list, where XLA's copy insertion
    # is conservative — returning just the written leaves keeps the store
    # off the branch boundary entirely
    def rebuild_vals(_):
        return _build_local_map(ms, cfg, T_pred)

    def keep_vals(_):
        return (ms.map_corner, ms.map_corner_valid,
                ms.map_surf, ms.map_surf_valid)

    if cfg.loop_closure_enabled:
        mc, mco, msf, msfo = jax.lax.cond(ms.map_dirty, rebuild_vals,
                                          keep_vals, None)
    else:
        # radius mode: the surround set depends on the current pose, so the
        # map refreshes every mapping frame (reference re-merges each frame
        # in this branch too, LM.cpp:452-457)
        mc, mco, msf, msfo = rebuild_vals(None)
    ms = ms._replace(map_corner=mc, map_corner_valid=mco,
                     map_surf=msf, map_surf_valid=msfo,
                     map_dirty=jnp.bool_(False))
    map_c, map_c_ok = ms.map_corner, ms.map_corner_valid
    map_s, map_s_ok = ms.map_surf, ms.map_surf_valid
    (c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok) = _downsample_scan(
        corner_pts, corner_valid, surf_pts, surf_valid,
        outlier_pts, outlier_valid, cfg)

    params0 = se3.mat_to_params(T_pred)
    has_map = ms.graph.count > 0
    params = jnp.where(
        has_map,
        _scan_to_map(params0, c_ds, c_ok, st_ds, st_ok,
                     map_c, map_c_ok, map_s, map_s_ok, cfg, assoc=assoc),
        params0)
    T_new = se3.params_to_mat(params)

    # saveKeyFramesAndFactor (LM.cpp:636-704); squared-distance gate quirk kept
    last_idx = jnp.maximum(ms.graph.count - 1, 0)
    last_t = ms.graph.poses[last_idx][:3, 3]
    moved = jnp.sum((T_new[:3, 3] - last_t) ** 2) >= cfg.min_keyframe_dist_sq
    is_kf = (ms.graph.count == 0) | moved

    # UNCONDITIONAL masked row-writes — no lax.cond, no full-buffer select.
    # The round-4 profile showed ~1.3 ms/mapping-frame of copies XLA inserted
    # for the cond-wrapped save whose true branch selected between the
    # original and an updated 100+ MiB keyframe store.  Gating the VALUE of
    # one row (write the existing row back when not keyframing) keeps every
    # buffer a pure dynamic-update-slice the compiler aliases in place; at
    # capacity the keyframe is rejected (pg.add_keyframe counts it in
    # graph.overflow; the host driver surfaces the condition) — never
    # overwrite stored clouds against a frozen graph.
    at_cap = ms.graph.count >= cfg.max_keyframes
    write = is_kf & ~at_cap
    k = jnp.minimum(ms.graph.count, cfg.max_keyframes - 1)

    def wr(a, v):
        return a.at[k].set(jnp.where(write, v, a[k]))

    ms = ms._replace(
        graph=pg.add_keyframe(ms.graph, T_new, do=is_kf),
        kf_times=wr(ms.kf_times, time),
        kf_corner=wr(ms.kf_corner, c_ds),
        kf_corner_valid=wr(ms.kf_corner_valid, c_ok),
        kf_surf=wr(ms.kf_surf, s_ds),
        kf_surf_valid=wr(ms.kf_surf_valid, s_ok),
        kf_outlier=wr(ms.kf_outlier, o_ds),
        kf_outlier_valid=wr(ms.kf_outlier_valid, o_ok),
        map_dirty=ms.map_dirty | write,
    )

    # transformUpdate (LM.cpp:626-634)
    T_map2odom = T_new @ se3.inv_mat(T_odom2laser)
    ms = ms._replace(T_map2odom=T_map2odom, T_map2laser=T_new)
    return ms, T_new


def compact_keyframes(ms: MappingState, cfg: PipelineConfig) -> MappingState:
    """Keyframe decimation at capacity — the "keep mapping forever" policy.

    The reference retains every keyframe unboundedly (LM.cpp:67-69,699-701);
    with static capacity the round-2 policy (reject + count) froze mapping in
    new territory once full.  This pass halves the OLD keyframe density
    instead — drop every 2nd keyframe outside the recent window, echoing the
    reference's own 1 m ``ds_keyposes_`` pose-thinning idea (LM.cpp:174) —
    so new keyframes always find room and the tail keeps mapping.

    Kept unconditionally: node 0 (the prior), the recent window
    (``recent_keyframe_search_num`` — the loop-closure-mode local map), and
    every endpoint of an accepted loop factor (so stored loop constraints
    stay EXACT; only chain links are re-derived between surviving
    neighbours from current estimates, which is exact whenever the chain is
    internally consistent — always true between loop events).

    Runs as its own jitted program invoked by the host driver
    (SlamPipeline) when the graph approaches capacity; the per-frame
    ``slam_step``/``scan_sequence`` programs are unchanged.
    """
    g = ms.graph
    M = cfg.max_keyframes
    dtype = g.poses.dtype
    idx = jnp.arange(M, dtype=jnp.int32)
    count = g.count
    active = idx < count

    recent_start = count - cfg.recent_keyframe_search_num
    keep = active & ((idx >= recent_start) | (idx % 2 == 0))
    # pin loop-factor endpoints (constraints stay exact, no rel rewrite)
    l_act = jnp.arange(g.loop_w.shape[0]) < g.loop_count
    keep = keep.at[g.loop_i].max(l_act)
    keep = keep.at[g.loop_j].max(l_act)
    keep = keep & active

    new_count = jnp.sum(keep).astype(jnp.int32)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1        # new index of kept
    # stable compaction permutation: kept rows ascending, dropped after
    perm = jnp.argsort(jnp.where(keep, idx, M + idx))
    row_ok = idx < new_count

    poses = jnp.where(row_ok[:, None, None], g.poses[perm],
                      jnp.eye(4, dtype=dtype))
    # re-derive chain rels between surviving neighbours (current estimates)
    prev = jnp.where(row_ok[:, None, None],
                     poses[jnp.maximum(idx - 1, 0)], jnp.eye(4, dtype=dtype))
    rels = jax.vmap(lambda a, b: se3.inv_mat(a) @ b)(prev, poses)
    chain_rel = jnp.where((idx > 0)[:, None, None], rels, poses)

    def gath(a, ok_like=None):
        out = a[perm]
        mask = row_ok.reshape((M,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, out, jnp.zeros_like(out))

    graph = g._replace(
        poses=poses, chain_rel=chain_rel,
        loop_i=jnp.where(l_act, rank[g.loop_i], g.loop_i),
        loop_j=jnp.where(l_act, rank[g.loop_j], g.loop_j),
        count=new_count,
    )
    return ms._replace(
        graph=graph,
        kf_times=gath(ms.kf_times),
        kf_corner=gath(ms.kf_corner),
        kf_corner_valid=gath(ms.kf_corner_valid),
        kf_surf=gath(ms.kf_surf),
        kf_surf_valid=gath(ms.kf_surf_valid),
        kf_outlier=gath(ms.kf_outlier),
        kf_outlier_valid=gath(ms.kf_outlier_valid),
        last_loop_kf=jnp.where(ms.last_loop_kf >= 0,
                               rank[jnp.maximum(ms.last_loop_kf, 0)],
                               ms.last_loop_kf),
        map_dirty=jnp.bool_(True),
    )


# ---------------------------------------------------------------------------
# Loop closure (LM.cpp:779-975)
# ---------------------------------------------------------------------------

def _loop_acceptance(res: ICPResult, src, src_ok, tgt, tgt_ok,
                     cfg: PipelineConfig):
    """(accept, factor_weight, inlier_frac) for an ICP result.

    Reference mode (``loop_min_inlier_frac == 0``): raw
    ``getFitnessScore() < history_fitness_score`` (LM.cpp:842) — a mean
    squared NN distance over ALL source points, which scales with point
    density and collapses under partial overlap.

    Normalised mode (default): the gate counts STRUCTURE points only —
    height above the source cloud's own ground level > 0.4 m.  Ground
    returns match ground anywhere (a 3 m-misaligned attempt still scored
    0.44 all-point inlier fraction in calibration), while walls/poles are
    alignment-sensitive: measured on the tiny golden scene, structure
    inlier fraction at r=1 m is 0.90 for the correct alignment vs 0.18
    misaligned by 3 m (0.30 after ICP polished the wrong basin).  A
    fraction >= ``loop_min_inlier_frac`` of structure points must land
    within ``loop_inlier_radius`` of the history cloud AND their RMS must
    beat ``loop_inlier_rmse`` — both density- and overlap-invariant, so
    one calibration holds across sensor configs (the r3 raw gate had to
    move 0.3 -> 0.5 between configs)."""
    if cfg.loop_min_inlier_frac <= 0.0:
        accept = res.converged & (res.fitness < cfg.history_fitness_score)
        weight = 1.0 / jnp.maximum(res.fitness, 1e-3)
        return accept, weight, jnp.asarray(0.0, src.dtype)

    from ..ops.bev_align import _ground_z
    moved = src @ res.transform[:3, :3].T + res.transform[:3, 3]
    # structure-to-STRUCTURE matching: restricting the target too is what
    # makes the gate sharp — low wall points otherwise "match" the dense
    # ground lattice anywhere (measured: an 87 deg-wrong alignment still
    # scored 0.79 structure inlier fraction against an unfiltered target)
    tgt_struct = tgt_ok & (tgt[:, 2] - _ground_z(tgt, tgt_ok) > 0.4)
    d2, _ = knn(moved, src_ok, tgt, tgt_struct, 1, chunk=cfg.knn_chunk)
    d2 = d2[:, 0]
    struct = src_ok & (src[:, 2] - _ground_z(src, src_ok) > 0.4)
    inl = struct & (d2 < cfg.loop_inlier_radius ** 2)
    n_str = jnp.maximum(jnp.sum(struct), 1)
    n_inl = jnp.sum(inl)
    frac = n_inl.astype(src.dtype) / n_str.astype(src.dtype)
    ms_inl = (jnp.sum(jnp.where(inl, d2, 0.0))
              / jnp.maximum(n_inl, 1).astype(src.dtype))
    # a cloud with (almost) no structure is unverifiable: reject (the
    # all-ground degenerate case would otherwise accept anything)
    enough_struct = jnp.sum(struct) >= 32
    accept = (res.converged & enough_struct
              & (frac >= cfg.loop_min_inlier_frac)
              & (ms_inl <= cfg.loop_inlier_rmse ** 2))
    weight = 1.0 / jnp.maximum(ms_inl, 1e-3)
    return accept, weight, frac

def _keyframe_cloud(ms: MappingState, k, pose, cap, cfg, leaf=None):
    """All three feature clouds of keyframe k, transformed by ``pose``."""
    pts = jnp.concatenate([ms.kf_corner[k], ms.kf_surf[k], ms.kf_outlier[k]], 0)
    val = jnp.concatenate([ms.kf_corner_valid[k], ms.kf_surf_valid[k],
                           ms.kf_outlier_valid[k]], 0)
    moved = pts @ pose[:3, :3].T + pose[:3, 3]
    if leaf is None:
        return compact_masked(moved, val, cap)
    return voxel_downsample(moved, val, leaf, cap)


def _chain_path_to_latest(ms: MappingState, latest, cfg: PipelineConfig):
    """Path length along the odometry chain from each keyframe to the
    latest one: cumulative sum of between-measurement translations.
    (chain_rel[0] is the node-0 prior, not a step.)"""
    idx = jnp.arange(cfg.max_keyframes)
    step = jnp.linalg.norm(ms.graph.chain_rel[:, :3, 3], axis=-1)
    step = jnp.where((idx > 0) & (idx < ms.graph.count), step, 0.0)
    cum = jnp.cumsum(step)
    return jnp.maximum(cum[jnp.maximum(latest, 0)] - cum, 0.0)


def detect_loop(ms: MappingState, cfg: PipelineConfig):
    """Drift-aware candidate search.

    The reference radius-searches keyposes at a FIXED 10 m
    (LM.cpp:909-943); accumulated drift grows with path length, so the
    effective radius here is ``history_search_radius +
    loop_drift_radius_frac * path(i -> latest)`` and candidates rank by
    drift-normalised distance d2 / r_eff^2 (a 300 m revisit at 3% drift
    appears ~9 m off — past the fixed radius, well inside the scaled one).
    >30 s age gate as in the reference (LM.cpp:934)."""
    latest = ms.graph.count - 1
    cur_t = ms.graph.poses[latest][:3, 3]
    kp = ms.graph.poses[:, :3, 3]
    idx = jnp.arange(cfg.max_keyframes)
    act = (idx < latest) & (latest >= 0)
    d2 = jnp.sum((kp - cur_t) ** 2, -1)
    old_enough = (ms.kf_times[latest] - ms.kf_times) > cfg.loop_time_gap
    r_eff = (cfg.history_search_radius
             + cfg.loop_drift_radius_frac * _chain_path_to_latest(
                 ms, latest, cfg))
    score = d2 / (r_eff * r_eff)
    elig = act & old_enough & (score < 1.0)
    closest = jnp.argmin(jnp.where(elig, score, 1e30)).astype(jnp.int32)
    return elig.any(), closest, latest


def loop_closure_step(ms: MappingState, cfg: PipelineConfig,
                      graph_optimizer=None, graph_energy_fn=None):
    """performLoopClosure equivalent. Returns (new_state, closed?, fitness).

    ``graph_optimizer(graph) -> graph``: optional replacement for the
    single-device pose-graph solve — parallel/sharded_mapping passes the
    distributed Schur solver here (SURVEY §7 phase 7).

    ``graph_energy_fn(graph) -> scalar``: the objective used to pick between
    the dual initializations (see ``close`` below).  Defaults to the
    single-device objective at ``cfg.pose_graph_chain_sigma`` — which also
    matches the distributed Schur solver, since parallel/sharded_mapping
    builds it from the SAME config sigma.  A custom ``graph_optimizer``
    minimising a differently-weighted objective must pass the matching
    energy here, or the dual-init pick can prefer the wrong basin."""
    if graph_energy_fn is None:
        graph_energy_fn = lambda g: pg.graph_energy(  # noqa: E731
            g, cfg.pose_graph_chain_sigma)
    found, closest, latest = detect_loop(ms, cfg)

    def attempt(ms):
        pose_latest = ms.graph.poses[latest]
        # raw (unfiltered) source cloud: PCL's getFitnessScore averages over
        # raw source points; voxel-filtering shifts the fitness distribution
        # and would break the 0.3 acceptance gate's calibration
        src, src_ok = _keyframe_cloud(ms, latest, pose_latest,
                                      cfg.loop_latest_cap, cfg)
        # the ICP *iterations* run on a statically decimated source — a
        # Kabsch update on ~2k correspondences is as well-conditioned as on
        # 4k and each 1-NN pass halves (46 -> ~23 ms/attempt on v5e); the
        # acceptance gate below still scores the FULL source
        d = max(1, cfg.loop_icp_decimate)
        src_i, src_i_ok = src[::d], src_ok[::d]

        # history cloud: +-history_search_num keyframes around the candidate
        # (contiguous window -> dynamic_slice, not gather)
        span = 2 * cfg.history_search_num + 1
        start = jnp.clip(closest - cfg.history_search_num, 0,
                         max(cfg.max_keyframes - span, 0))
        rows = start + jnp.arange(span, dtype=jnp.int32)
        ok_j = ((jnp.abs(rows - closest) <= cfg.history_search_num)
                & (rows >= 0) & (rows < latest))

        def slc(a):
            return jax.lax.dynamic_slice_in_dim(a, start, span, axis=0)

        poses_j = slc(ms.graph.poses)
        cv = slc(ms.kf_corner_valid) & ok_j[:, None]
        sv = slc(ms.kf_surf_valid) & ok_j[:, None]
        ov = slc(ms.kf_outlier_valid) & ok_j[:, None]
        pts = jnp.concatenate([
            _transform_kf_clouds(poses_j, slc(ms.kf_corner), cv).reshape(-1, 3),
            _transform_kf_clouds(poses_j, slc(ms.kf_surf), sv).reshape(-1, 3),
            _transform_kf_clouds(poses_j, slc(ms.kf_outlier), ov).reshape(-1, 3),
        ], 0)
        val = jnp.concatenate([cv.reshape(-1), sv.reshape(-1),
                               ov.reshape(-1)], 0)
        tgt, tgt_ok = voxel_downsample(pts, val, cfg.history_leaf,
                                       cfg.loop_hist_cap)

        res = icp_point_to_point(src_i, src_i_ok, tgt, tgt_ok, cfg.icp_iters,
                                 cfg.icp_max_corr_dist, cfg.icp_translation_eps)
        accept, _, _ = _loop_acceptance(res, src, src_ok, tgt, tgt_ok, cfg)

        if cfg.loop_coarse_align:
            # wide-basin rescue (ops/bev_align): only paid when the
            # identity-initialised attempt fails the gate.  A bird's-eye
            # structure-grid correlation recovers (yaw, dx, dy, dz) globally
            # — covering BOTH the translation drift the round-3 validation
            # showed (9 m, outside any point-to-point basin) and the yaw
            # drift the old multi-start handled — then one full ICP refines.
            def rescue(res):
                from ..ops.bev_align import bev_align
                ba = bev_align(src, src_ok, tgt, tgt_ok,
                               pose_latest[:2, 3],
                               ms.graph.poses[closest][:2, 3],
                               grid=cfg.loop_bev_grid, res=cfg.loop_bev_res,
                               n_yaw=cfg.loop_bev_yaws)
                # the BEV start is already near-basin: a short refine budget
                # suffices (the identity attempt above keeps the full budget
                # because it must close from raw drift)
                res_b = icp_point_to_point(
                    src_i, src_i_ok, tgt, tgt_ok,
                    min(cfg.icp_iters, cfg.loop_rescue_icp_iters),
                    cfg.icp_max_corr_dist, cfg.icp_translation_eps,
                    T0=ba.transform)
                better = res_b.converged & (res_b.fitness < res.fitness)
                pick = lambda a, b: jnp.where(better, a, b)  # noqa: E731
                return ICPResult(transform=pick(res_b.transform, res.transform),
                                 fitness=pick(res_b.fitness, res.fitness),
                                 converged=pick(res_b.converged, res.converged),
                                 iters=pick(res_b.iters, res.iters))

            res = jax.lax.cond(accept, lambda r: r, rescue, res)
            accept, _, _ = _loop_acceptance(res, src, src_ok, tgt, tgt_ok,
                                            cfg)
        _, weight, inlier_frac = _loop_acceptance(res, src, src_ok, tgt,
                                                  tgt_ok, cfg)

        # consistency gate 1 (pre-solve): the correction displaces the
        # latest pose by at most the plausible accumulated drift — a larger
        # "correction" is a false match (wrong street / aliased geometry)
        if cfg.loop_max_correction_abs > 0:
            path_cl = _chain_path_to_latest(ms, latest, cfg)[closest]
            disp = jnp.linalg.norm((res.transform @ pose_latest)[:3, 3]
                                   - pose_latest[:3, 3])
            budget = (cfg.loop_max_correction_abs
                      + cfg.loop_max_correction_frac * path_cl)
            accept = accept & (disp <= budget)

        def close(ms):
            # t_correct = correction * pose_latest (LM.cpp:862-868)
            T_corrected = res.transform @ pose_latest
            rel = se3.inv_mat(T_corrected) @ ms.graph.poses[closest]

            # ---- anchor-hinged smear initialization (round-4) ----
            # GN cannot retro-correct a large loop from the drifted poses:
            # the cheap correction is ROTATIONAL chain bending (per-link
            # yaw with the remaining path as lever arm), but the
            # linearization at the drifted state sits in a local minimum
            # whose translation-only escape costs ~(|c|^2/n)/sigma_t — the
            # solve leaves the loop residual at 95% (measured on the s3_0
            # validation graph: 12 m correction, GN moved 0.5 m; the
            # reference's stiff Variances, LM.cpp:202, leave its iSAM2 in
            # the same basin and its correctPoses cosmetic).  Initialize
            # instead by hinging the chain at the loop anchor: every node
            # k gets the left correction A exp(f_k * d_A) A^-1 with f_k
            # the path fraction closest -> latest, which IS the banana
            # bend (nodes before the anchor keep f=0); GN then polishes
            # inside the correct basin.  Measured (first-close graph of
            # the s3_0 validation run): ATE 8.79 -> 2.33 m, loop residual
            # 10.3 m -> 0.06 m, at the unchanged chain sigma.  A clean
            # side effect: poses[latest] lands at ~T_corrected, so the
            # NEXT keyframe's chain_rel no longer records the map2odom
            # rebase as a 12 m odometry teleport (which permanently
            # contradicted later loop factors).
            A = ms.graph.poses[closest]
            d_A = se3.se3_log(se3.inv_mat(A) @ res.transform @ A)
            idxs = jnp.arange(cfg.max_keyframes)
            step = jnp.linalg.norm(ms.graph.chain_rel[:, :3, 3], axis=-1)
            step = jnp.where((idxs > 0) & (idxs < ms.graph.count), step, 0.0)
            cum = jnp.cumsum(step)
            denom = jnp.maximum(cum[latest] - cum[closest], 1e-6)
            f = jnp.clip((cum - cum[closest]) / denom, 0.0, 1.0)
            D = jax.vmap(lambda fk: A @ se3.se3_exp(d_A * fk)
                         @ se3.inv_mat(A))(f.astype(d_A.dtype))
            smeared = jnp.einsum("nij,njk->nik", D, ms.graph.poses)
            act = (idxs < ms.graph.count)[:, None, None]

            # factored O(N) GN (ops/chain_solver): the full relinearised
            # solve runs here, where the reference spends its iSAM2 update
            # x2 (LM.cpp:880-881).  TWO initializations, keep the
            # lower-energy solution: the smear is the right prior when
            # drift accumulated along the path (the 12 m validation case GN
            # alone cannot escape), the RAW poses when the discrepancy is
            # concentrated near the latest node (there the smear corrupts
            # healthy mid-chain nodes and a few GN iters cannot fully pull
            # them back).  Energy = the solve's own objective, so the pick
            # is exactly "whichever basin optimized further".
            g_raw = pg.add_loop_factor(ms.graph, latest, closest, rel,
                                       weight)
            g_sm = g_raw._replace(
                poses=jnp.where(act, smeared, g_raw.poses))

            def solve(g):
                if graph_optimizer is None:
                    return pg.optimize(g, cfg.pose_graph_chain_sigma,
                                       iters=cfg.pose_graph_gn_iters)
                return graph_optimizer(g)

            g0, g1 = solve(g_raw), solve(g_sm)
            e0 = graph_energy_fn(g0)
            e1 = graph_energy_fn(g1)
            g = jax.tree_util.tree_map(
                lambda a, b: jnp.where(e1 < e0, a, b), g1, g0)
            # correctPoses map2odom rebase (LM.cpp:725-726); keyframe poses
            # moved -> cached local map is stale
            T_m2o = res.transform @ ms.T_map2odom
            new_ms = ms._replace(graph=g, T_map2odom=T_m2o,
                                 T_map2laser=g.poses[latest],
                                 map_dirty=jnp.bool_(True))
            # consistency gate 2 (post-solve): the solve must not bend any
            # chain link beyond its odometry covariance's plausible range —
            # a factor the chain "refuses" to absorb is rolled back.  Both
            # translation AND rotation residuals are checked: the chain
            # absorbs a large endpoint correction through tiny per-link YAW
            # bends (lever arm), so a translation-only check misses it
            if cfg.loop_chain_bend_max > 0:
                idx = jnp.arange(cfg.max_keyframes)
                prev = g.poses[jnp.maximum(idx - 1, 0)]
                E = jax.vmap(lambda a, b, z: se3.inv_mat(z)
                             @ se3.inv_mat(a) @ b)(prev, g.poses, g.chain_rel)
                link = (idx > 0) & (idx < g.count)
                bend_t = jnp.linalg.norm(E[:, :3, 3], axis=-1)
                cos_r = (jnp.einsum("nii->n", E[:, :3, :3]) - 1.0) * 0.5
                bend_r = jnp.arccos(jnp.clip(cos_r, -1.0, 1.0))
                rot_max = jnp.deg2rad(jnp.asarray(
                    cfg.loop_chain_bend_max_rot_deg, bend_r.dtype))
                ok_bend = (
                    (jnp.max(jnp.where(link, bend_t, 0.0))
                     <= cfg.loop_chain_bend_max)
                    & (jnp.max(jnp.where(link, bend_r, 0.0)) <= rot_max))
                new_ms = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok_bend, a, b), new_ms, ms)
                return new_ms, accept & ok_bend
            return new_ms, accept

        ms, committed = jax.lax.cond(
            accept, close, lambda m: (m, jnp.bool_(False)), ms)
        return ms, committed, res.fitness, inlier_frac

    def skip(ms):
        dt = ms.T_map2odom.dtype
        return (ms, jnp.bool_(False), jnp.asarray(1e9, dt),
                jnp.asarray(0.0, dt))

    do = found & (latest != ms.last_loop_kf) & (ms.graph.count > 1)
    ms, closed, fitness, inlier = jax.lax.cond(do, attempt, skip, ms)
    ms = ms._replace(
        last_loop_kf=jnp.where(do, latest, ms.last_loop_kf),
        loop_attempts=ms.loop_attempts + do.astype(jnp.int32),
        loop_best_fitness=jnp.where(
            do, jnp.minimum(ms.loop_best_fitness, fitness),
            ms.loop_best_fitness),
        loop_best_inlier=jnp.where(
            do, jnp.maximum(ms.loop_best_inlier, inlier),
            ms.loop_best_inlier))
    return ms, closed, fitness
