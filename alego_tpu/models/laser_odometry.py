"""Scan-to-scan odometry (stage 2 back half, C10/C11 equivalent).

Re-design of ``/root/reference/src/LO.cpp:387-625`` as one jittable step:

* correspondence search: the per-point ``nearestKSearch`` + sequential
  in-ring scans (LO.cpp:408-477, 498-552) become one MXU distance matrix per
  feature family with per-query ring masks — the ring-ordered early-break
  traversal of the reference visits exactly the points with
  ``|ring - closest_ring| <= 2.5``, which is what the masks select;
* the "two-step" optimisation keeps the reference's exact structure: solve
  surf residuals first (Jacobian restricted to z), then corners are
  associated with the updated pose and solved jointly with the surf blocks
  (x, y, z, yaw; roll/pitch never move — utility.h:162-167, 224-232);
* pose integration is yaw-only, as in LO.cpp:579-583;
* the frame-to-frame parameter block persists across frames (LO.cpp never
  resets ``params_``), giving a constant-velocity warm start.

The previous frame's less-flat / less-sharp clouds and their ring ids play
the role of ``surf_last_`` / ``corner_last_`` + KD-trees (LO.cpp:610-613).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops import se3
from ..ops.features import FeatureClouds
from ..ops.knn import nn1_best as nn1, masked_argmin_dist
from ..ops.residuals import point_to_line, point_to_plane_3pt
from ..ops.gauss_newton import solve_gn, SURF_DIMS, STEP_B_DIMS


class OdometryState(NamedTuple):
    params: jnp.ndarray         # [6] frame-to-frame warm start (LO.cpp:64)
    t_w: jnp.ndarray            # [3] world position
    R_w: jnp.ndarray            # [3, 3] world rotation
    initialized: jnp.ndarray    # bool scalar
    surf_pts: jnp.ndarray       # [MLF, 3] previous less-flat
    surf_valid: jnp.ndarray
    surf_ring: jnp.ndarray
    corner_pts: jnp.ndarray     # [MLS, 3] previous less-sharp
    corner_valid: jnp.ndarray
    corner_ring: jnp.ndarray


def init_state(cfg: PipelineConfig, dtype=jnp.float32) -> OdometryState:
    return OdometryState(
        params=jnp.zeros(6, dtype),
        t_w=jnp.zeros(3, dtype),
        R_w=jnp.eye(3, dtype=dtype),
        initialized=jnp.bool_(False),
        surf_pts=jnp.zeros((cfg.max_less_flat, 3), dtype),
        surf_valid=jnp.zeros(cfg.max_less_flat, bool),
        surf_ring=jnp.zeros(cfg.max_less_flat, jnp.int32),
        corner_pts=jnp.zeros((cfg.max_less_sharp, 3), dtype),
        corner_valid=jnp.zeros(cfg.max_less_sharp, bool),
        corner_ring=jnp.zeros(cfg.max_less_sharp, jnp.int32),
    )


def _associate_surf(params, fc: FeatureClouds, st: OdometryState,
                    cfg: PipelineConfig):
    """Surf correspondences (LO.cpp:408-478): nearest + same-ring second +
    nearby-ring third point, all within sqrt(25) m."""
    sel = se3.transform_points(params, fc.flat_pts)
    d1, i1 = nn1(sel, fc.flat_valid, st.surf_pts, st.surf_valid,
                 chunk=st.surf_pts.shape[0])
    ok1 = fc.flat_valid & (d1 < cfg.nearest_feature_dist_sq)
    cs = st.surf_ring[i1]                              # closest ring per query

    ring = st.surf_ring[None, :]
    validN = st.surf_valid[None, :]
    not_closest = jax.lax.broadcasted_iota(jnp.int32, (sel.shape[0],
                                           st.surf_pts.shape[0]), 1) != i1[:, None]
    same_ring = validN & (ring == cs[:, None]) & not_closest
    near_ring = validN & (ring != cs[:, None]) & (
        jnp.abs(ring - cs[:, None]) <= cfg.ring_search_span)

    d2, i2 = masked_argmin_dist(sel, st.surf_pts, same_ring)
    d3, i3 = masked_argmin_dist(sel, st.surf_pts, near_ring)
    ok = (ok1 & (d2 < cfg.nearest_feature_dist_sq)
          & (d3 < cfg.nearest_feature_dist_sq))
    return (fc.flat_pts, st.surf_pts[i1], st.surf_pts[i2], st.surf_pts[i3],
            ok.astype(sel.dtype))


def _associate_corner(params, fc: FeatureClouds, st: OdometryState,
                      cfg: PipelineConfig):
    """Corner correspondences (LO.cpp:498-552): nearest + best point on a
    *different* nearby ring (the edge must span rings).

    With ``cfg.odom_dense_corners`` the query set is the full less-sharp
    cloud rather than the reference's 2-per-sector sharp picks — ~10x the
    constraints for the same batched kernel shapes (see config)."""
    if cfg.odom_dense_corners:
        q_pts, q_valid = fc.less_sharp_pts, fc.less_sharp_valid
    else:
        q_pts, q_valid = fc.sharp_pts, fc.sharp_valid
    sel = se3.transform_points(params, q_pts)
    d1, i1 = nn1(sel, q_valid, st.corner_pts, st.corner_valid,
                 chunk=st.corner_pts.shape[0])
    ok1 = q_valid & (d1 < cfg.nearest_feature_dist_sq)
    cs = st.corner_ring[i1]
    ring = st.corner_ring[None, :]
    diff_ring = st.corner_valid[None, :] & (ring != cs[:, None]) & (
        jnp.abs(ring - cs[:, None]) <= cfg.ring_search_span)
    d2, i2 = masked_argmin_dist(sel, st.corner_pts, diff_ring)
    ok = ok1 & (d2 < cfg.nearest_feature_dist_sq)
    return q_pts, st.corner_pts[i1], st.corner_pts[i2], ok.astype(sel.dtype)


def odometry_step(st: OdometryState, fc: FeatureClouds, cfg: PipelineConfig):
    """One odometry frame. Returns (new_state, pose4x4_world)."""
    def two_step(params):
        # ---- step A: surf association + z-only solve (LO.cpp:408-492) ----
        s_cp, s_pj, s_pl, s_pm, s_w = _associate_surf(params, fc, st, cfg)

        def surf_res(p):
            r, J = point_to_plane_3pt(p, s_cp, s_pj, s_pl, s_pm)
            return r, J, s_w

        params_a = solve_gn(surf_res, params, cfg.odom_surf_iters,
                            SURF_DIMS, cfg.huber_delta,
                            min_count=cfg.min_correspondences,
                            eig_floor=cfg.odom_eig_floor,
                            prior_weight=cfg.odom_prior_weight)

        # ---- step B: corner association (updated pose) + joint solve ----
        c_cp, c_pj, c_pl, c_w = _associate_corner(params_a, fc, st, cfg)
        enough_corners = jnp.sum(c_w > 0) >= cfg.min_correspondences

        def joint_res(p):
            r_s, J_s = point_to_plane_3pt(p, s_cp, s_pj, s_pl, s_pm)
            r_c, J_c = point_to_line(p, c_cp, c_pj, c_pl)
            # corners carry x, y, yaw info; surfs carry z (masked at solver
            # level jointly via STEP_B_DIMS; per-family column zeroing as in
            # the ref)
            J_s = J_s * SURF_DIMS.astype(J_s.dtype)[None, :]
            corner_dims = jnp.array([1, 1, 0, 0, 0, 1], J_c.dtype)
            J_c = J_c * corner_dims[None, :]
            r = jnp.concatenate([r_s, r_c])
            J = jnp.concatenate([J_s, J_c])
            w = jnp.concatenate([s_w, c_w * enough_corners.astype(c_w.dtype)])
            return r, J, w

        params_b = solve_gn(joint_res, params_a, cfg.odom_corner_iters,
                            STEP_B_DIMS, cfg.huber_delta,
                            min_count=cfg.min_correspondences,
                            eig_floor=cfg.odom_eig_floor,
                            prior_weight=cfg.odom_prior_weight)
        # with too few corners the reference skips the second ceres::Solve
        # entirely, leaving the step-A result (LO.cpp:556-574)
        return jnp.where(enough_corners, params_b, params_a)

    # outer re-association passes (cfg.odom_outer_iters; see config — fixes
    # the locked-in association bias at yaw-rate transitions)
    params_b = st.params
    for _ in range(max(cfg.odom_outer_iters, 1)):
        params_b = two_step(params_b)

    # first frame: no previous features -> keep params (all-zero weights keep
    # GN inert anyway; make it explicit)
    params_new = jnp.where(st.initialized, params_b, st.params)

    # ---- pose integration: yaw-only rotation (LO.cpp:579-583) ----
    t_delta = params_new[:3]
    R_delta = se3.yaw_to_rot(params_new[5])
    t_w = jnp.where(st.initialized, st.t_w + st.R_w @ t_delta, st.t_w)
    R_w = jnp.where(st.initialized, st.R_w @ R_delta, st.R_w)

    pose = jnp.eye(4, dtype=t_w.dtype)
    pose = pose.at[:3, :3].set(R_w).at[:3, 3].set(t_w)

    new_state = OdometryState(
        params=params_new,
        t_w=t_w, R_w=R_w,
        initialized=jnp.bool_(True),
        surf_pts=fc.less_flat_pts, surf_valid=fc.less_flat_valid,
        surf_ring=fc.less_flat_ring,
        corner_pts=fc.less_sharp_pts, corner_valid=fc.less_sharp_valid,
        corner_ring=fc.less_sharp_ring,
    )
    return new_state, pose
