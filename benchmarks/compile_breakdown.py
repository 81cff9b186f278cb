"""Cold-compile time per pipeline stage on the real TPU (VERDICT r2 #6).

Measures jit lower+compile wall time for each stage and for the composed
programs, against a THROWAWAY compilation cache so every number is a true
cold compile.  Prints a table and writes benchmarks/compile_breakdown.json.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# throwaway cache: we WANT cold numbers
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcold")

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from alego_tpu.config import PipelineConfig
from alego_tpu.models import pipeline, laser_odometry as lo, laser_mapping as lm
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features


def zeros_like_shape(tree):
    return jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


def main():
    cfg = PipelineConfig()
    state = pipeline.init_state(cfg)
    pts = jnp.zeros((cfg.max_raw_points, 3), jnp.float32)
    msk = jnp.zeros((cfg.max_raw_points,), bool)
    t0f = jnp.float32(0.0)

    seg_s = jax.eval_shape(lambda p, m: image_projection(p, m, cfg), pts, msk)
    seg = zeros_like_shape(seg_s)
    fc_s = jax.eval_shape(lambda s: extract_features(s, cfg), seg)
    fc = zeros_like_shape(fc_s)

    n_frames = int(os.environ.get("BENCH_FRAMES", "192"))
    seq_p = jnp.zeros((n_frames, cfg.max_raw_points, 3), jnp.float32)
    seq_m = jnp.zeros((n_frames, cfg.max_raw_points), bool)
    times = jnp.zeros(n_frames, jnp.float32)

    cases = [
        ("image_projection", lambda: jax.jit(
            lambda p, m: image_projection(p, m, cfg)).lower(pts, msk)),
        ("extract_features", lambda: jax.jit(
            lambda s: extract_features(s, cfg)).lower(seg)),
        ("odometry_step", lambda: jax.jit(
            lambda st, f: lo.odometry_step(st, f, cfg)).lower(state.odo, fc)),
        ("mapping_step", lambda: jax.jit(
            lambda ms: lm.mapping_step(
                ms, jnp.eye(4), fc.less_sharp_pts, fc.less_sharp_valid,
                fc.less_flat_pts, fc.less_flat_valid,
                jnp.zeros((cfg.max_outlier, 3)),
                jnp.zeros(cfg.max_outlier, bool), t0f, cfg)[0]
        ).lower(state.mapping)),
        ("loop_closure_step", lambda: jax.jit(
            lambda ms: lm.loop_closure_step(ms, cfg)[0]).lower(state.mapping)),
        ("compact_keyframes", lambda: jax.jit(
            lambda ms: lm.compact_keyframes(ms, cfg)).lower(state.mapping)),
        ("slam_step", lambda: jax.jit(
            lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg)
        ).lower(state, pts, msk, t0f)),
        (f"scan_sequence({n_frames})", lambda: jax.jit(
            lambda st, p, m, t: pipeline.scan_sequence(st, p, m, t, cfg)
        ).lower(state, seq_p, seq_m, times)),
    ]

    rows = []
    for name, make in cases:
        t0 = time.time()
        lowered = make()
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        rows.append(dict(stage=name, lower_s=round(t_lower, 1),
                         compile_s=round(t_compile, 1)))
        print(f"{name:24s} lower {t_lower:6.1f}s  compile {t_compile:6.1f}s",
              flush=True)

    with open(os.path.join(REPO, "benchmarks", "compile_breakdown.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
