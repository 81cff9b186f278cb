"""Measure the exact-vs-parallel sector-picking ATE delta (VERDICT weak #4).

The reference picks features sector-by-sector in strict order
(LO.cpp:279-385); ``parallel_sectors=True`` lets all 6 sectors take their
best eligible point simultaneously each step, differing only when two
sectors' picks fall within the 5-column suppression radius of each other in
the same iteration.  This script runs the SAME fixed-seed scenarios as the
golden regression tests under both modes and prints the measured deltas, so
the default in config.py is backed by a committed number instead of a
docstring claim.

Run:  python benchmarks/sector_mode_delta.py   (CPU is fine; ~minutes)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from alego_tpu.config import tiny_config
from alego_tpu.models.pipeline import SlamPipeline
from alego_tpu.utils import synthetic, metrics


SCENARIOS = [
    # (name, seed, n, speed, radius, closed, loop_on)
    ("arc", 101, 24, 0.5, 30.0, False, False),
    ("fast_arc", 102, 24, 1.2, 25.0, False, False),
    ("closed_loop", 103, 60, None, 10.0, True, True),
]


def run(seed, n, speed, radius, closed, loop_on, parallel):
    cfg = tiny_config(icp_iters=30).replace(
        loop_closure_enabled=loop_on, loop_time_gap=3.0,
        history_search_num=10, history_fitness_score=0.5,
        parallel_sectors=parallel)
    if closed:
        poses = synthetic.loop_trajectory(n, radius=radius, closed=True)
    else:
        poses = synthetic.loop_trajectory(n, radius=radius, speed=speed,
                                          closed=False)
    world = synthetic.make_world(seed=seed, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01,
                                          seed=seed)
    pipe = SlamPipeline(cfg)
    t0 = time.time()
    est = pipe.run_scanned(pts, mask)
    wall = time.time() - t0
    return (metrics.ate_rmse(est[:, :3, 3], poses[:, :3, 3], align=False),
            wall)


def main():
    out = {}
    for name, seed, n, speed, radius, closed, loop_on in SCENARIOS:
        row = {}
        for mode, par in (("parallel", True), ("exact", False)):
            ate, wall = run(seed, n, speed, radius, closed, loop_on, par)
            row[mode] = {"ate_m": round(float(ate), 4),
                         "wall_s": round(wall, 1)}
            print(f"{name:12s} {mode:9s} ATE {ate:.4f} m  ({wall:.1f}s)",
                  flush=True)
        d = row["parallel"]["ate_m"] - row["exact"]["ate_m"]
        row["delta_m"] = round(d, 4)
        out[name] = row
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sector_mode_delta.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
