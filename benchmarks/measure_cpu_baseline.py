"""Measure the single-core CPU rate of the full pipeline (bench denominator).

Run pinned to one core:  taskset -c 0 env JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_cpu_multi_thread_eigen=false" python benchmarks/measure_cpu_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from alego_tpu.config import PipelineConfig
    from alego_tpu.models import pipeline
    from alego_tpu.utils import synthetic

    cfg = PipelineConfig()
    n = 4
    poses = synthetic.loop_trajectory(n, radius=30.0, speed=1.0, closed=False)
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)
    scan = jax.jit(lambda st, p, m, t: pipeline.scan_sequence(st, p, m, t, cfg))
    st = pipeline.init_state(cfg)
    times = jnp.arange(n, dtype=jnp.float32) * cfg.scan_period
    _, est = scan(st, jnp.asarray(pts), jnp.asarray(mask), times)
    _ = np.asarray(est[-1])
    t0 = time.time()
    _, est = scan(st, jnp.asarray(pts), jnp.asarray(mask), times)
    _ = np.asarray(est[-1])
    ms = (time.time() - t0) / n * 1e3
    out = {"description": "single-core CPU full-pipeline rate (bench denominator)",
           "ms_per_frame": round(ms, 1), "fps": round(1000.0 / ms, 2)}
    path = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
