"""Multi-seed ATE A/B harness on the scan path (fast: one device call/seed).

Used to evaluate candidate fixes for the seed-tail robustness problem
(VERDICT r2 #2: ATE [0.227, 0.575, 2.694] across render seeds).  Renders
(or loads cached) 5 noise realizations of the 192-frame closed circuit and
reports per-seed ATE + loop counts for the CURRENT config, with optional
config overrides from the command line:

    python benchmarks/ab_seeds.py                       # baseline
    python benchmarks/ab_seeds.py map_eig_floor=30      # variant
"""

import json
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
from alego_tpu.utils import synthetic, metrics

SEEDS = (0, 1, 2, 3, 4)


def load_seq(cfg, n_frames, seed, poses):
    cache = os.path.join(REPO, "benchmarks",
                         f"_seq_cache_v2_{n_frames}_{cfg.horizon_scan}"
                         + ("" if seed == 0 else f"_s{seed}") + ".npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return d["pts"], d["mask"]
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    t0 = time.time()
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=seed)
    print(f"rendered seed {seed} in {time.time()-t0:.1f}s", file=sys.stderr)
    np.savez(cache, pts=pts, mask=mask)
    return pts, mask


def main():
    overrides = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                v = v == "True"
        overrides[k] = v
    cfg = PipelineConfig().replace(**overrides)
    n_frames = int(os.environ.get("BENCH_FRAMES", "192"))
    poses = synthetic.loop_trajectory(n_frames, radius=30.0, speed=1.6,
                                      closed=True)
    times = jnp.arange(n_frames, dtype=jnp.float32) * cfg.scan_period
    state = pipeline.init_state(cfg)
    scan = jax.jit(lambda st, p, m, t: pipeline.scan_sequence(st, p, m, t, cfg))

    results = []
    for si, seed in enumerate(SEEDS):
        pts, mask = load_seq(cfg, n_frames, seed, poses)
        t0 = time.time()
        st, est = scan(state, jnp.asarray(pts), jnp.asarray(mask), times)
        est = np.asarray(est)
        dt = time.time() - t0
        ate = metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False)
        results.append(dict(seed=seed, ate=round(float(ate), 3),
                            loops=int(st.mapping.graph.loop_count),
                            attempts=int(st.mapping.loop_attempts),
                            fit=round(float(st.mapping.loop_best_fitness), 3)))
        print(f"seed {seed}: ATE {ate:.3f} loops={results[-1]['loops']} "
              f"fit={results[-1]['fit']} ({dt:.0f}s)", flush=True)
    ates = [r["ate"] for r in results]
    summary = dict(overrides=overrides, results=results,
                   median=round(float(np.median(ates)), 3),
                   worst=round(float(max(ates)), 3))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
