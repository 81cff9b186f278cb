"""Association-phase micro-breakdown on the real TPU (the mapping hot spot).

mapping = 2 outer x [association 4.9 ms + GN 1.0 ms] + ds 1.0 ms (measured,
benchmarks/map_breakdown.py). This drills into the 4.9 ms: Pallas kNN per
feature class, the [Q,5] neighbour gathers, PCA line fit, plane fit.
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
from alego_tpu.utils import synthetic


def main():
    cfg = PipelineConfig()
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
    T_pred = ms.T_map2odom @ state.T_odom2laser
    c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok = jax.jit(
        lambda: lm._downsample_scan(fc.less_sharp_pts, fc.less_sharp_valid,
                                    fc.less_flat_pts, fc.less_flat_valid,
                                    seg.outlier_points, seg.outlier_valid,
                                    cfg))()
    map_c, map_c_ok = ms.map_corner, ms.map_corner_valid
    map_s, map_s_ok = ms.map_surf, ms.map_surf_valid
    params0 = se3.mat_to_params(T_pred)
    sel_c = se3.transform_points(params0, c_ds)
    sel_s = se3.transform_points(params0, st_ds)

    K = cfg.map_knn
    t_knn_c = timed(lambda q: knn(q, c_ok, map_c, map_c_ok, K,
                                  chunk=cfg.knn_chunk), (sel_c,))
    t_knn_s = timed(lambda q: knn(q, st_ok, map_s, map_s_ok, K,
                                  chunk=cfg.knn_chunk), (sel_s,))

    d_c, i_c = jax.jit(lambda q: knn(q, c_ok, map_c, map_c_ok, K,
                                     chunk=cfg.knn_chunk))(sel_c)
    d_s, i_s = jax.jit(lambda q: knn(q, st_ok, map_s, map_s_ok, K,
                                     chunk=cfg.knn_chunk))(sel_s)

    t_gather_c = timed(lambda i: map_c[i], (i_c,))
    t_gather_s = timed(lambda i: map_s[i], (i_s,))

    nbrs_c = jax.jit(lambda i: map_c[i])(i_c)
    nbrs_s = jax.jit(lambda i: map_s[i])(i_s)
    t_pca = timed(lambda n: pca_line_fit(n, jnp.ones(n.shape[:2], bool))[2],
                  (nbrs_c,))
    t_plane = timed(lambda n: plane_fit(n, jnp.ones(n.shape[:2], bool),
                                        cfg.plane_fit_tol)[0], (nbrs_s,))
    t_tf = timed(lambda p: se3.transform_points(p, st_ds), (params0,))

    print(f"shapes: corner q {sel_c.shape[0]} x map {map_c.shape[0]}; "
          f"surf q {sel_s.shape[0]} x map {map_s.shape[0]}; K={K}")
    print(f"kNN corner              : {t_knn_c*1e3:7.3f} ms")
    print(f"kNN surf                : {t_knn_s*1e3:7.3f} ms")
    print(f"gather nbrs corner [Q,5]: {t_gather_c*1e3:7.3f} ms")
    print(f"gather nbrs surf  [Q,5] : {t_gather_s*1e3:7.3f} ms")
    print(f"PCA line fit (corner)   : {t_pca*1e3:7.3f} ms")
    print(f"plane fit (surf)        : {t_plane*1e3:7.3f} ms")
    print(f"transform_points (surf) : {t_tf*1e3:7.3f} ms")
    tot = t_knn_c + t_knn_s + t_gather_c + t_gather_s + t_pca + t_plane + 2 * t_tf
    print(f"sum                     : {tot*1e3:7.3f} ms (assoc measured 4.9)")


if __name__ == "__main__":
    main()
