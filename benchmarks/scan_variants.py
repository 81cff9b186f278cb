"""Decompose the in-scan per-frame cost by timing scan_sequence variants.

Stage harnesses (roofline/mapping_bisect) time stages STANDALONE; the bench
headline runs them inside lax.scan where carry double-buffering, cond
branches and donation behave differently.  This harness times the REAL scan
program under surgical config mutations to attribute the per-frame cost:

  full        the bench program (loop-inclusive, cfg defaults)
  noloop      loop branch not lowered (loop_closure_enabled=False)
  hoistloop   loop branch hoisted out of scan (loop_in_step=False) -- scan
              cost without attempts, same mapping semantics as full
  nomap       mapping decimation 10^9 -> front end (proj+feat+odo) only

Per-rep wall times are printed so chip/tunnel variance is visible.
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
from alego_tpu.models import pipeline
from alego_tpu.utils import synthetic


def load_seq(cfg, n_frames):
    cache = os.path.join(REPO, "benchmarks",
                         f"_seq_cache_v2_{n_frames}_{cfg.horizon_scan}.npz")
    poses = synthetic.loop_trajectory(n_frames, radius=30.0, speed=1.6,
                                      closed=True)
    if os.path.exists(cache):
        d = np.load(cache)
        return poses, d["pts"], d["mask"]
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)
    np.savez(cache, pts=pts, mask=mask)
    return poses, pts, mask


def time_variant(name, cfg, pts_d, mask_d, times, reps=4):
    state = pipeline.init_state(cfg)
    scan = jax.jit(lambda st, p, m, t: pipeline.scan_sequence(st, p, m, t,
                                                              cfg))
    n = pts_d.shape[0]
    t0 = time.time()
    st, est = scan(state, pts_d, mask_d, times)
    _ = np.asarray(est[-1])
    comp = time.time() - t0
    per = []
    for _ in range(reps):
        t0 = time.time()
        st, est = scan(state, pts_d, mask_d, times)
        _ = np.asarray(est[-1])
        per.append((time.time() - t0) / n * 1e3)
    loops = int(st.mapping.graph.loop_count) if hasattr(st.mapping, "graph") \
        else -1
    print(f"{name:10s} compile+1st {comp:6.1f}s  "
          f"ms/frame {['%.2f' % p for p in per]}  "
          f"median {np.median(per):.2f}  loops {loops}", flush=True)
    return float(np.median(per))


def time_frontscan(cfg, pts_d, mask_d, times, reps=4, stages=3):
    """Scan of ONLY the front end (proj [+ features [+ odometry]]) with a
    small carry — no MappingState in the carry, no do_map cond.  Separates
    'the front stages are slow' from 'the mapping cond/carry taxes every
    frame'."""
    from alego_tpu.models import laser_odometry as lo
    from alego_tpu.models.image_projection import image_projection
    from alego_tpu.ops.features import extract_features

    def body(odo, inp):
        p, m, t = inp
        seg = image_projection(p, m, cfg)
        if stages == 1:
            return odo, seg.points[0]
        fc = extract_features(seg, cfg)
        if stages == 2:
            return odo, fc.less_sharp_pts[0]
        odo, T = lo.odometry_step(odo, fc, cfg)
        return odo, T

    scan = jax.jit(lambda st, p, m, t: jax.lax.scan(body, st, (p, m, t)))
    st0 = lo.init_state(cfg)
    n = pts_d.shape[0]
    t0 = time.time()
    st, out = scan(st0, pts_d, mask_d, times)
    _ = np.asarray(out[-1])
    comp = time.time() - t0
    per = []
    for _ in range(reps):
        t0 = time.time()
        st, out = scan(st0, pts_d, mask_d, times)
        _ = np.asarray(out[-1])
        per.append((time.time() - t0) / n * 1e3)
    name = {1: "projscan", 2: "projfeat", 3: "frontscan"}[stages]
    print(f"{name:10s} compile+1st {comp:6.1f}s  "
          f"ms/frame {['%.2f' % p for p in per]}  "
          f"median {np.median(per):.2f}", flush=True)
    return float(np.median(per))


def main():
    cfg = PipelineConfig()
    n_frames = int(os.environ.get("BENCH_FRAMES", "192"))
    poses, pts, mask = load_seq(cfg, n_frames)
    pts_d = jnp.asarray(pts)
    mask_d = jnp.asarray(mask)
    times = jnp.arange(n_frames, dtype=jnp.float32) * cfg.scan_period

    which = sys.argv[1:] or ["full", "hoistloop", "noloop", "nomap"]
    variants = {
        "full": cfg,
        "hoistloop": cfg.replace(loop_in_step=False),
        "noloop": cfg.replace(loop_closure_enabled=False),
        "nomap": cfg.replace(map_frame_decimation=10 ** 9),
    }
    out = {}
    for name in which:
        if name in ("frontscan", "projfeat", "projscan"):
            stages = {"projscan": 1, "projfeat": 2, "frontscan": 3}[name]
            out[name] = time_frontscan(cfg, pts_d, mask_d, times,
                                       stages=stages)
        else:
            out[name] = time_variant(name, variants[name], pts_d, mask_d,
                                     times)
    print({k: round(v, 2) for k, v in out.items()})


if __name__ == "__main__":
    main()
