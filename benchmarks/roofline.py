"""Per-kernel speed-of-light analysis on the real TPU (VERDICT missing #8).

Times every pipeline stage in isolation at the full 16x4000 geometry,
derives each stage's minimum HBM traffic and useful FLOPs from the config
shapes, and reports achieved vs peak — so "12.28 ms/frame" decomposes into
"which stage sits at what fraction of which roof, and where the next 2x
lives".

Peaks used (TPU v5e / v5 lite, public spec):
  HBM bandwidth 819 GB/s; MXU 197 TFLOP/s bf16, ~1/6 of that for
  f32-HIGHEST (6-pass).  The pipeline runs f32 end to end (accuracy:
  alego_tpu/__init__.py), so the compute roof quoted is the f32 one.

Timing under the tunneled axon backend: block_until_ready does not fence,
so each stage is wrapped in a scan of K repetitions and fenced with a host
transfer; per-call time = (t_K - overhead) / K, minus the measured
~30 ms/K dispatch floor (benchmarks/_timing.py) — without the floor
subtraction every stage reads ~1 ms high at K = 30.

Writes benchmarks/roofline.json and prints a table.
"""

import json
import os
import sys
import time

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

from alego_tpu.config import PipelineConfig
from alego_tpu.models import pipeline, laser_odometry as lo, laser_mapping as lm
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.utils import synthetic

HBM_GBPS = 819.0
MXU_F32_TFLOPS = 197.0 / 6.0


from _timing import timed, dispatch_floor  # noqa: E402 (needs sys.path)


def main():
    cfg = PipelineConfig()
    R, H = cfg.n_scan, cfg.horizon_scan
    f4 = 4  # bytes per f32

    print("rendering one representative frame...", file=sys.stderr)
    poses = synthetic.loop_trajectory(8, radius=30.0, speed=1.6, closed=False)
    world = synthetic.make_world(seed=100, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)

    # drive a few real frames to get representative intermediate states
    state = pipeline.init_state(cfg)
    step = jax.jit(lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg))
    for k in range(8):
        state, _ = step(state, jnp.asarray(pts[k]), jnp.asarray(mask[k]),
                        jnp.float32(k * cfg.scan_period))
    seg = jax.jit(lambda p, m: image_projection(p, m, cfg))(
        jnp.asarray(pts[-1]), jnp.asarray(mask[-1]))
    fc = jax.jit(lambda s: extract_features(s, cfg))(seg)

    rows = []

    def add(name, sec, bytes_, flops, note):
        sec = max(sec, 1e-6)   # floor-subtracted times can clamp to 0
        gbps = bytes_ / sec / 1e9
        tflops = flops / sec / 1e12
        mem_frac = gbps / HBM_GBPS
        mxu_frac = tflops / MXU_F32_TFLOPS
        # when BOTH peaks are nearly idle the stage is dominated by kernel
        # dispatch / serial latency, not by either roofline wall (ADVICE r2:
        # labelling such rows "compute" misclassifies them downstream)
        if max(mem_frac, mxu_frac) < 0.02:
            bound = "latency"
        else:
            bound = "memory" if mem_frac >= mxu_frac else "compute"
        rows.append({
            "stage": name, "ms": round(sec * 1e3, 3),
            "GB_per_s": round(gbps, 1), "pct_HBM_peak": round(100 * mem_frac, 1),
            "TFLOP_per_s": round(tflops, 2),
            "pct_MXU_f32_peak": round(100 * mxu_frac, 1),
            "bound": bound, "model": note,
        })

    # --- stage 1: projection + segmentation --------------------------------
    sec = timed(lambda p, m: image_projection(p, m, cfg),
                (jnp.asarray(pts[-1]), jnp.asarray(mask[-1])))
    # traffic: raw in (N*4*4) + ~10 image-shaped passes over [R,H] for
    # scatter/ground/CCL doubling rounds (log2(H)~12 reach rounds dominate)
    b = cfg.max_raw_points * 4 * f4 + 14 * R * H * 3 * f4
    fl = 14 * R * H * 10
    add("projection+segmentation", sec, b, fl,
        "raw 4N + ~14 [R,H] image passes (CCL doubling)")

    # --- features ----------------------------------------------------------
    sec = timed(lambda s: extract_features(s, cfg), (seg,))
    W = cfg.ring_width
    b = R * W * (10 * f4)       # curvature window + sort passes per ring
    fl = R * W * 11 * 2 + R * W * 40
    add("feature extraction", sec, b, fl, "per-ring curvature + masked picks")

    # --- odometry (two-step GN) -------------------------------------------
    ost = state.odo
    sec = timed(lambda st, f: lo.odometry_step(st, f, cfg), (ost, fc))
    # association runs ONCE per step (surf assoc -> 5-iter z solve; corner
    # assoc -> 5-iter joint solve); the GN iterations are [Q,6] einsums with
    # negligible flops.  An earlier model multiplied the 1-NN matrices by
    # the iteration count and overstated flops ~150x.
    fl = (cfg.max_flat * cfg.max_less_flat
          + cfg.max_sharp * cfg.max_less_sharp) * 8
    b = (cfg.max_flat + cfg.max_less_flat
         + cfg.max_sharp + cfg.max_less_sharp) * 3 * f4 * 2
    add("odometry (2-step GN)", sec, b, fl,
        "3x re-associated two-step GN; dispatch-latency-bound")

    # --- mapping (KNN + 6-DoF GN + keyframe/ds) ----------------------------
    ms = state.mapping
    T = state.T_odom2laser
    sec = timed(
        lambda ms_, T_: lm.mapping_step(
            ms_, T_, fc.less_sharp_pts, fc.less_sharp_valid,
            fc.less_flat_pts, fc.less_flat_valid,
            seg.outlier_points, seg.outlier_valid,
            jnp.float32(1.0), cfg)[0].T_map2laser,
        (ms, T))
    # association runs once per OUTER iteration (2x), not per GN iteration —
    # an earlier model multiplied by map_gn_iters and overstated flops ~24x
    qc, qs = cfg.kf_corner_cap, cfg.kf_surf_cap + cfg.kf_outlier_cap
    mc, msf = cfg.map_corner_cap, cfg.map_surf_cap
    fl = cfg.map_outer_iters * 8 * (qc * mc + qs * msf)
    b = cfg.map_outer_iters * (qc + mc + qs + msf) * 3 * f4 * 2
    add("mapping (scan-to-map)", sec, b, fl,
        f"{cfg.map_outer_iters}x [5-NN {qc}x{mc} + {qs}x{msf} assoc "
        "+ <=20-iter GN]; local-map rebuild (scatter-free voxel merge) "
        "+ association dominate, not flops")

    # --- loop-closure attempt (ICP) ---------------------------------------
    # loop_closure_step on an 8-frame state takes the no-candidate lax.cond
    # branch (detect_loop finds nothing inside loop_time_gap) — timing it
    # would measure the no-op arm (exactly the 0.038 ms mistake this row
    # once shipped with).  Time the production ICP kernel itself at the
    # full loop capacities instead: that is what a real attempt pays.
    from alego_tpu.ops.icp import icp_point_to_point
    src_n, tgt_n = cfg.loop_latest_cap, cfg.loop_hist_cap
    rng_l = np.random.default_rng(5)
    tgt_pts = jnp.asarray(rng_l.uniform(-30, 30, (tgt_n, 3)), jnp.float32)
    src_pts = (jnp.asarray(rng_l.uniform(-30, 30, (src_n, 3)), jnp.float32)
               + jnp.asarray([0.4, -0.2, 0.1], jnp.float32))
    sec = timed(lambda s, t: icp_point_to_point(
        s, jnp.ones(src_n, bool), t, jnp.ones(tgt_n, bool),
        cfg.icp_iters, cfg.icp_max_corr_dist, cfg.icp_translation_eps
    ).transform, (src_pts, tgt_pts))
    fl = cfg.icp_iters * src_n * tgt_n * 8
    b = cfg.icp_iters * (src_n + tgt_n) * 3 * f4
    add("loop ICP attempt (kernel)", sec, b, fl,
        f"<= {cfg.icp_iters}x 1-NN {src_n}x{tgt_n}; flops model assumes all "
        "iters, so %peak is an upper bound when the eps early-stop fires")

    # --- full pipeline step ------------------------------------------------
    # thread the state through the repetition loop — with constant args XLA
    # hoists the loop-invariant step out and measures only loop overhead
    p_in, m_in = jnp.asarray(pts[-1]), jnp.asarray(mask[-1])

    def whole(st):
        # perturb the constant inputs with the carried frame counter: without
        # this XLA hoists the whole front end (projection/features of p_in)
        # out of the timing loop as loop-invariant code
        z = st.frame.astype(jnp.float32) * 0.0
        st2, _ = pipeline.slam_step(st, p_in + z, m_in,
                                    st.frame.astype(jnp.float32) * 0.2, cfg)
        return st2

    reps = 16
    loop = jax.jit(lambda st: jax.lax.fori_loop(0, reps, lambda _, s: whole(s),
                                                st))
    o = loop(state)
    _ = np.asarray(o.frame)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        o = loop(state)
        _ = np.asarray(o.frame)
        best = min(best, (time.time() - t0) / reps)
    best = max(best - dispatch_floor(reps), 0.0)
    add("full slam_step (threaded)", best, 0, 0,
        "whole-frame composite (mapping every 2nd frame)")

    out = {"device": str(jax.devices()[0]), "peaks":
           {"hbm_GBps": HBM_GBPS, "mxu_f32_TFLOPs": round(MXU_F32_TFLOPS, 1)},
           "stages": rows}
    path = os.path.join(REPO, "benchmarks", "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    hdr = (f"{'stage':28s} {'ms':>8s} {'GB/s':>7s} {'%HBM':>6s} "
           f"{'TF/s':>7s} {'%MXU':>6s}  bound")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['stage']:28s} {r['ms']:8.3f} {r['GB_per_s']:7.1f} "
              f"{r['pct_HBM_peak']:6.1f} {r['TFLOP_per_s']:7.2f} "
              f"{r['pct_MXU_f32_peak']:6.1f}  {r['bound']}")
    print(f"-> {path}")


if __name__ == "__main__":
    main()
