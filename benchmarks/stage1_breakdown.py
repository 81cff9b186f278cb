"""Stage-1 micro-breakdown on the real TPU: projection scatter, CCL
(connectivity, reach masks, fixpoint iterations), compaction sorts, and the
feature-extraction sub-phases (curvature/occlusion, picking loop, gathers).

Identifies where the latency-bound front half of the frame actually goes
before any kernel work is attempted.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _timing import timed  # noqa: E402

from alego_tpu.config import PipelineConfig
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops import projection as proj_mod
from alego_tpu.ops import segmentation as seg_mod
from alego_tpu.ops.features import (curvature_and_window, occlusion_mask,
                                    extract_features)
from alego_tpu.utils import synthetic


def main():
    cfg = PipelineConfig()
    poses = synthetic.loop_trajectory(4, radius=30.0, speed=1.6, closed=False)
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)
    p, m = jnp.asarray(pts[-1]), jnp.asarray(mask[-1])

    img = jax.jit(lambda p, m: proj_mod.project_scan(p, m, cfg))(p, m)

    t_proj = timed(lambda p, m: proj_mod.project_scan(p, m, cfg).ranges, (p, m))

    # CCL pieces
    segmentable = img.valid & ~img.ground
    t_conn = timed(lambda r, s: seg_mod._neighbor_connectivity(r, s, cfg)[0],
                   (img.ranges, segmentable))
    conn_right, conn_up = jax.jit(
        lambda r, s: seg_mod._neighbor_connectivity(r, s, cfg))(
        img.ranges, segmentable)
    t_masks = timed(lambda c: seg_mod._reach_masks(c)[-1], (conn_right,))

    t_label = timed(lambda i: seg_mod.label_components(i, cfg)[0], (img,))

    # how many fixpoint iterations does a real scan take?
    masks = jax.jit(lambda c: seg_mod._reach_masks(c))(conn_right)
    R, H = img.ranges.shape
    flat = jnp.arange(R * H, dtype=jnp.int32).reshape(R, H)
    big = jnp.int32(R * H)

    def one_round(lab):
        lab = seg_mod._row_run_min(lab, masks)
        rows = [lab[i] for i in range(R)]
        for i in range(1, R):
            rows[i] = jnp.minimum(rows[i], jnp.where(conn_up[i - 1], rows[i - 1], big))
        for i in range(R - 2, -1, -1):
            rows[i] = jnp.minimum(rows[i], jnp.where(conn_up[i], rows[i + 1], big))
        return jnp.stack(rows)

    lab = flat
    iters = 0
    stepf = jax.jit(one_round)
    while True:
        new = stepf(lab)
        iters += 1
        if bool(jnp.all(new == lab)) or iters > 40:
            break
        lab = new
    t_round = timed(one_round, (flat,))

    _, seg_ok, outlier_px = jax.jit(
        lambda i: seg_mod.label_components(i, cfg))(img)
    t_compact = timed(
        lambda i, s, o: seg_mod.compact(i, s, o, cfg).ranges,
        (img, seg_ok, outlier_px))

    t_stage1 = timed(lambda p, m: image_projection(p, m, cfg).ranges, (p, m))

    # features sub-phases
    seg = jax.jit(lambda p, m: image_projection(p, m, cfg))(p, m)
    t_curv = timed(lambda s: curvature_and_window(s, cfg)[0], (seg,))
    t_occl = timed(lambda s: occlusion_mask(s, cfg), (seg,))
    t_feat = timed(lambda s: extract_features(s, cfg).less_flat_pts, (seg,))

    print(f"projection (scatter)    : {t_proj*1e3:7.3f} ms")
    print(f"CCL connectivity        : {t_conn*1e3:7.3f} ms")
    print(f"CCL reach masks (12 lv) : {t_masks*1e3:7.3f} ms")
    print(f"CCL one H+V round       : {t_round*1e3:7.3f} ms  x {iters} rounds to fixpoint")
    print(f"CCL total (label_comp.) : {t_label*1e3:7.3f} ms")
    print(f"compaction (sorts)      : {t_compact*1e3:7.3f} ms")
    print(f"stage-1 total           : {t_stage1*1e3:7.3f} ms")
    print(f"features: curvature     : {t_curv*1e3:7.3f} ms")
    print(f"features: occlusion     : {t_occl*1e3:7.3f} ms")
    print(f"features: total         : {t_feat*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
