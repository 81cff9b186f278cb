"""Fine-grained mapping-step cost breakdown on the real TPU.

Splits the 13.2 ms `mapping_step` into: local-map rebuild, scan voxel
downsample, NN association (per outer), GN solve loop (per outer), and
keyframe bookkeeping — with measured GN iteration counts — so the next
optimization targets the real cost, not the roofline's coarse model.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(REPO, 'benchmarks'))
from _timing import timed  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alego_tpu.config import PipelineConfig
from alego_tpu.models import pipeline, laser_mapping as lm
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.ops import se3
from alego_tpu.ops.knn import knn_best as knn
from alego_tpu.ops.eig3 import pca_line_fit, plane_fit
from alego_tpu.ops.residuals import point_to_line, point_to_plane_fitted
from alego_tpu.ops.gauss_newton import solve_gn, FULL_DIMS
from alego_tpu.utils import synthetic


def main():
    cfg = PipelineConfig()
    print("rendering + driving 8 frames...", file=sys.stderr)
    poses = synthetic.loop_trajectory(8, radius=30.0, speed=1.6, closed=False)
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)

    state = pipeline.init_state(cfg)
    step = jax.jit(lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg))
    for k in range(8):
        state, _ = step(state, jnp.asarray(pts[k]), jnp.asarray(mask[k]),
                        jnp.float32(k * cfg.scan_period))
    seg = jax.jit(lambda p, m: image_projection(p, m, cfg))(
        jnp.asarray(pts[-1]), jnp.asarray(mask[-1]))
    fc = jax.jit(lambda s: extract_features(s, cfg))(seg)

    ms = state.mapping
    T = state.T_odom2laser
    T_pred = ms.T_map2odom @ T

    # pieces ---------------------------------------------------------------
    t_rebuild = timed(lambda m: lm._build_local_map(m, cfg, T_pred)[0], (ms,))
    t_ds = timed(
        lambda: lm._downsample_scan(fc.less_sharp_pts, fc.less_sharp_valid,
                                    fc.less_flat_pts, fc.less_flat_valid,
                                    seg.outlier_points, seg.outlier_valid,
                                    cfg)[0], ())

    c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok = jax.jit(
        lambda: lm._downsample_scan(fc.less_sharp_pts, fc.less_sharp_valid,
                                    fc.less_flat_pts, fc.less_flat_valid,
                                    seg.outlier_points, seg.outlier_valid,
                                    cfg))()
    map_c, map_c_ok = ms.map_corner, ms.map_corner_valid
    map_s, map_s_ok = ms.map_surf, ms.map_surf_valid
    params0 = se3.mat_to_params(T_pred)

    def associate(params):
        sel_c = se3.transform_points(params, c_ds)
        d_c, i_c = knn(sel_c, c_ok, map_c, map_c_ok, cfg.map_knn,
                       chunk=cfg.knn_chunk)
        nbrs = map_c[i_c]
        center, direction, ev = pca_line_fit(nbrs, jnp.ones_like(d_c, bool))
        sel_s = se3.transform_points(params, st_ds)
        d_s, i_s = knn(sel_s, st_ok, map_s, map_s_ok, cfg.map_knn,
                       chunk=cfg.knn_chunk)
        nbrs_s = map_s[i_s]
        unit_n, d0, plane_ok = plane_fit(nbrs_s, jnp.ones_like(d_s, bool),
                                         cfg.plane_fit_tol)
        near_c = c_ok & (d_c[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        near_s = st_ok & (d_s[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        is_line = ev[:, 2] > cfg.line_eig_ratio * ev[:, 1]
        pj = center + 0.1 * direction
        pl = center - 0.1 * direction
        w_line = (near_c & is_line).astype(params.dtype)
        w_plane = (near_s & plane_ok).astype(params.dtype)
        return pj, pl, w_line, unit_n, d0, w_plane

    t_assoc = timed(associate, (params0,))

    pj, pl, w_line, unit_n, d0, w_plane = jax.jit(associate)(params0)

    def res_fn(p):
        r_c, J_c = point_to_line(p, c_ds, pj, pl)
        r_s, J_s = point_to_plane_fitted(p, st_ds, unit_n, d0)
        r = jnp.concatenate([r_c, r_s])
        J = jnp.concatenate([J_c, J_s])
        w = jnp.concatenate([w_line, w_plane])
        return r, J, w

    def gn(iters):
        return lambda p: solve_gn(res_fn, p, iters, FULL_DIMS,
                                  cfg.huber_delta, param_tol=cfg.map_gn_tol)

    t_gn1 = timed(gn(1), (params0,))
    t_gn5 = timed(gn(5), (params0,))
    t_gn20 = timed(gn(cfg.map_gn_iters), (params0,))

    # measured iteration count: instrument the while loop by comparing
    # solve at k vs k+1 max iters until the result stops changing
    prev = None
    iters_used = cfg.map_gn_iters
    for k in range(1, cfg.map_gn_iters + 1):
        cur = np.asarray(jax.jit(gn(k))(params0))
        if prev is not None and np.allclose(cur, prev, atol=0):
            iters_used = k - 1
            break
        prev = cur

    t_full = timed(
        lambda m, t: lm.mapping_step(
            m, t, fc.less_sharp_pts, fc.less_sharp_valid,
            fc.less_flat_pts, fc.less_flat_valid,
            seg.outlier_points, seg.outlier_valid,
            jnp.float32(1.0), cfg)[0].T_map2laser, (ms, T))

    n_c = int(jnp.sum(c_ok))
    n_s = int(jnp.sum(st_ok))
    n_mc = int(jnp.sum(map_c_ok))
    n_ms = int(jnp.sum(map_s_ok))
    print(f"sizes: scan corner {n_c}/{c_ok.shape[0]}, surf {n_s}/{st_ok.shape[0]}; "
          f"map corner {n_mc}/{map_c.shape[0]}, surf {n_ms}/{map_s.shape[0]}")
    print(f"local-map rebuild      : {t_rebuild*1e3:7.3f} ms (only on keyframe/loop)")
    print(f"scan voxel downsample  : {t_ds*1e3:7.3f} ms")
    print(f"association (1 outer)  : {t_assoc*1e3:7.3f} ms")
    print(f"GN solve 1 iter        : {t_gn1*1e3:7.3f} ms")
    print(f"GN solve 5 iters       : {t_gn5*1e3:7.3f} ms")
    print(f"GN solve {cfg.map_gn_iters:2d} iters      : {t_gn20*1e3:7.3f} ms"
          f"  (early-stop converged at ~{iters_used})")
    per_it = (t_gn20 - t_gn1) / max(cfg.map_gn_iters - 1, 1)
    print(f"  -> per GN iteration  : {per_it*1e3:7.3f} ms")
    print(f"mapping_step total     : {t_full*1e3:7.3f} ms "
          f"(2 outer x [assoc + GN])")


if __name__ == "__main__":
    main()
