"""Diagnose loop-closure ICP rejections on the bench circuit.

Replays the cached bench sequence per-frame, snapshots MappingState right
before every loop attempt, then re-runs the attempt eagerly with
internals printed: cloud sizes, fitness trajectory across ICP iterations,
the recovered correction vs the actual accumulated drift (ground truth is
known for the synthetic circuit).
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alego_tpu.config import PipelineConfig
from alego_tpu.models import pipeline, laser_mapping as lm
from alego_tpu.ops import icp as icp_mod
from alego_tpu.utils import synthetic


def main():
    cfg = PipelineConfig()
    n_frames = int(os.environ.get("BENCH_FRAMES", "192"))
    cache = os.path.join(REPO, "benchmarks",
                         f"_seq_cache_v2_{n_frames}_{cfg.horizon_scan}.npz")
    poses_gt = synthetic.loop_trajectory(n_frames, radius=30.0, speed=1.6,
                                         closed=True)
    d = np.load(cache)
    pts, mask = d["pts"], d["mask"]

    step = jax.jit(lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg))
    state = pipeline.init_state(cfg)

    snapshots = []
    est = []
    t0 = time.time()
    for k in range(n_frames):
        before = int(state.mapping.loop_attempts)
        state, pose = step(state, jnp.asarray(pts[k]), jnp.asarray(mask[k]),
                           jnp.float32(k * cfg.scan_period))
        est.append(np.asarray(pose))
        after = int(state.mapping.loop_attempts)
        if after > before:
            print(f"frame {k}: loop attempt #{after}, "
                  f"best fitness so far {float(state.mapping.loop_best_fitness):.4f}",
                  flush=True)
            snapshots.append((k, jax.tree_util.tree_map(np.asarray,
                                                        state.mapping)))
        if k % 50 == 0:
            print(f"  frame {k} ({time.time() - t0:.0f}s)", flush=True)

    est = np.stack(est)
    drift = est[-1][:3, 3] - poses_gt[-1][:3, 3]
    print(f"final drift vs gt: {drift} (|{np.linalg.norm(drift):.3f}| m)")

    if not snapshots:
        print("NO loop attempts fired")
        return

    # dissect the LAST attempt (the one closest to closing the circuit):
    # note the snapshot is post-attempt; rebuild the attempt's inputs from it
    k, ms_np = snapshots[-1]
    ms = jax.tree_util.tree_map(jnp.asarray, ms_np)
    found, closest, latest = lm.detect_loop(lm.MappingState(*ms), cfg)
    ms = lm.MappingState(*ms)
    print(f"\nattempt at frame {k}: found={bool(found)} "
          f"closest={int(closest)} latest={int(latest)} "
          f"count={int(ms.graph.count)}")

    pose_latest = ms.graph.poses[int(latest)]
    src, src_ok = lm._keyframe_cloud(ms, int(latest), pose_latest,
                                     cfg.loop_latest_cap, cfg)
    print(f"source: {int(src_ok.sum())}/{src_ok.shape[0]} points")

    span = 2 * cfg.history_search_num + 1
    start = int(np.clip(int(closest) - cfg.history_search_num, 0,
                        max(cfg.max_keyframes - span, 0)))
    rows = start + np.arange(span)
    ok_j = (np.abs(rows - int(closest)) <= cfg.history_search_num) \
        & (rows >= 0) & (rows < int(latest))

    def slc(a):
        return jax.lax.dynamic_slice_in_dim(a, start, span, axis=0)

    poses_j = slc(ms.graph.poses)
    cv = slc(ms.kf_corner_valid) & jnp.asarray(ok_j)[:, None]
    sv = slc(ms.kf_surf_valid) & jnp.asarray(ok_j)[:, None]
    ov = slc(ms.kf_outlier_valid) & jnp.asarray(ok_j)[:, None]
    hist = jnp.concatenate([
        lm._transform_kf_clouds(poses_j, slc(ms.kf_corner), cv).reshape(-1, 3),
        lm._transform_kf_clouds(poses_j, slc(ms.kf_surf), sv).reshape(-1, 3),
        lm._transform_kf_clouds(poses_j, slc(ms.kf_outlier), ov).reshape(-1, 3),
    ], 0)
    hval = jnp.concatenate([cv.reshape(-1), sv.reshape(-1),
                            ov.reshape(-1)], 0)
    from alego_tpu.ops.voxel import voxel_downsample
    tgt, tgt_ok = voxel_downsample(hist, hval, cfg.history_leaf,
                                   cfg.loop_hist_cap)
    print(f"target: {int(tgt_ok.sum())}/{tgt_ok.shape[0]} points")

    # fitness at iteration counts 0 (initial), 10, 30, 100
    for iters in (1, 10, 30, 100):
        res = icp_mod.icp_point_to_point(src, src_ok, tgt, tgt_ok, iters,
                                         cfg.icp_max_corr_dist,
                                         cfg.icp_translation_eps)
        t = np.asarray(res.transform)
        print(f"  icp iters={iters:3d}: fitness={float(res.fitness):.4f} "
              f"converged={bool(res.converged)} "
              f"t=({t[0,3]:+.3f},{t[1,3]:+.3f},{t[2,3]:+.3f})")

    # the TRUE correction: estimated latest pose vs its ground-truth frame
    # (keyframe at frame index ~ 2*latest given 2x decimation)
    print(f"estimated latest kf pos: {np.asarray(pose_latest)[:3, 3]}")
    np.savez(os.path.join(REPO, "benchmarks", "_loop_debug.npz"),
             src=np.asarray(src), src_ok=np.asarray(src_ok),
             tgt=np.asarray(tgt), tgt_ok=np.asarray(tgt_ok),
             pose_latest=np.asarray(pose_latest))
    print("clouds -> benchmarks/_loop_debug.npz")


if __name__ == "__main__":
    main()
