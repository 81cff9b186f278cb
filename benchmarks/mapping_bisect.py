"""Cumulative bisect of mapping_step cost on the real TPU.

map_breakdown's piecewise rows under-measured: `timed()` pins evaluation by
perturbing FLOAT ARGS, so zero-arg lambdas get hoisted and read 0.000.  This
harness times cumulative prefixes of the mapping frame, all as functions of
(MappingState, T_odom) — float-bearing args — so every row is pinned.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(REPO, 'benchmarks'))
from _timing import timed  # noqa: E402

from alego_tpu.config import PipelineConfig
from alego_tpu.models import pipeline, laser_mapping as lm
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.ops import se3
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
    T = state.T_odom2laser

    co = (fc.less_sharp_pts, fc.less_sharp_valid)
    su = (fc.less_flat_pts, fc.less_flat_valid)
    ou = (seg.outlier_points, seg.outlier_valid)

    def v_pred(ms, T):
        return ms.T_map2odom @ T

    def v_rebuild(ms, T):
        return lm._build_local_map(ms, cfg, ms.T_map2odom @ T)

    def v_ds(ms, T):
        out = lm._downsample_scan(co[0] + 0 * T[0, 0], co[1], su[0], su[1],
                                  ou[0], ou[1], cfg)
        return out

    def v_assoc1(ms, T):
        T_pred = ms.T_map2odom @ T
        (c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok) = \
            lm._downsample_scan(co[0], co[1], su[0], su[1], ou[0], ou[1], cfg)
        params = se3.mat_to_params(T_pred)
        assoc = lm._default_assoc(cfg)
        sel_c = se3.transform_points(params, c_ds)
        d_c, nb_c = assoc(sel_c, c_ok, ms.map_corner, ms.map_corner_valid)
        sel_s = se3.transform_points(params, st_ds)
        d_s, nb_s = assoc(sel_s, st_ok, ms.map_surf, ms.map_surf_valid)
        return d_c, nb_c, d_s, nb_s

    def v_scan2map(ms, T):
        T_pred = ms.T_map2odom @ T
        (c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok) = \
            lm._downsample_scan(co[0], co[1], su[0], su[1], ou[0], ou[1], cfg)
        params0 = se3.mat_to_params(T_pred)
        return lm._scan_to_map(params0, c_ds, c_ok, st_ds, st_ok,
                               ms.map_corner, ms.map_corner_valid,
                               ms.map_surf, ms.map_surf_valid, cfg)

    def v_full(ms, T):
        return lm.mapping_step(ms, T, co[0], co[1], su[0], su[1],
                               ou[0], ou[1], jnp.float32(2.0), cfg)[1]

    rows = [
        ("T_pred only", v_pred),
        ("local-map rebuild (forced)", v_rebuild),
        ("downsample_scan", v_ds),
        ("assoc x1 (knn+coords)", v_assoc1),
        ("_scan_to_map (2 outer)", v_scan2map),
        ("mapping_step full", v_full),
    ]
    for name, fn in rows:
        sec = timed(fn, (ms, T))
        print(f"{name:28s}: {sec * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
