"""Per-stage error budget on the realistic sensor-sim circuit (round-4).

Round 3 left a 13x accuracy gap between the toy renderer (~0.2% drift) and
the realistic simulation (2.7%), with no measurement of WHICH stage degrades
under dropout/quantization/skew.  This harness replays the cached sim frames
through an INSTRUMENTED pipeline step (one lax.scan, IMU pre-integrated into
the buffer — equivalent to the streaming path because integration is causal
and de-skew interpolation is local) and records per frame:

  segmentation : valid points, outliers, ground fraction
  features     : sharp / less-sharp / flat / less-flat counts
  odometry     : surf+corner correspondence counts, (x, y, yaw) Hessian
                 spectrum of the corner step (the weak-direction diagnostic
                 from benchmarks/seed2_spectrum.py, now on the realistic data)
  trajectory   : odometry-frame and map-frame poses -> windowed RPE vs gt

Modes:
  python benchmarks/error_budget.py            # diagnostic budget JSON
  python benchmarks/error_budget.py --ab       # knob A/B: prior/floor/dense
Both accept --seeds K (default 2) and --frames N (default 240).

Output: benchmarks/error_budget.json / error_budget_ab.json.
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

import jax                        # noqa: E402
import jax.numpy as jnp           # noqa: E402

from alego_tpu.config import PipelineConfig          # noqa: E402
from alego_tpu.models import pipeline as pl          # noqa: E402
from alego_tpu.models import laser_odometry as lo    # noqa: E402
from alego_tpu.ops import deskew                     # noqa: E402
from alego_tpu.ops.features import extract_features  # noqa: E402
from alego_tpu.models.image_projection import image_projection  # noqa: E402
from alego_tpu.utils.metrics import ate_rmse         # noqa: E402

from validate_simlidar import VARIANTS, synth_imu    # noqa: E402

IMU_CAP = 2048


def load_variant(variant, n_frames, cfg):
    from alego_tpu.utils import sensor_sim as ss
    scene_seed, sim_seed, imu_seed, speed, half = variant
    tag = f"s{scene_seed}_{sim_seed}"
    cache = os.path.join(
        REPO, "benchmarks",
        f"_sim_cache_{n_frames}_{cfg.horizon_scan}_{tag}.npz")
    legacy = os.path.join(REPO, "benchmarks",
                          f"_sim_cache_{n_frames}_{cfg.horizon_scan}.npz")
    if tag == "s3_0" and not os.path.exists(cache) and os.path.exists(legacy):
        cache = legacy
    if not os.path.exists(cache):
        poses = ss.street_circuit(n_frames, half=half, speed=speed)
        scene = ss.make_urban_scene(seed=scene_seed, half=half)
        pts, mask = ss.simulate_sequence(scene, poses, cfg, seed=sim_seed)
        np.savez(cache, pts=pts, mask=mask)
    d = np.load(cache)
    poses = ss.street_circuit(n_frames, half=half, speed=speed)
    imu = synth_imu(n_frames, cfg, speed, half, seed=imu_seed)
    return d["pts"], d["mask"], poses, imu, tag


def prefill_imu(imu, cfg):
    """One chunked device call filling the whole buffer (causal integration
    == the streaming path; see module docstring)."""
    buf = deskew.init_buffer(IMU_CAP)
    ts = np.full(IMU_CAP, 1e18, np.float32)
    rpys = np.zeros((IMU_CAP, 3), np.float32)
    accs = np.zeros((IMU_CAP, 3), np.float32)
    n = min(len(imu), IMU_CAP)
    for i in range(n):
        t, r, a = imu[i]
        ts[i], rpys[i], accs[i] = t, r, a
    return jax.jit(deskew.integrate_imu_chunk)(
        buf, jnp.asarray(ts), jnp.asarray(rpys), jnp.asarray(accs),
        jnp.int32(n))


def make_cfg(**kw):
    return PipelineConfig(imu_queue_length=IMU_CAP, use_imu=True, **kw)


# ---------------------------------------------------------------------------
# instrumented scan
# ---------------------------------------------------------------------------

def diag_sequence(cfg):
    """jitted (state, frames) -> (state, per-frame diagnostics)."""

    def step(st, inp):
        p, m, t = inp
        seg = image_projection(p, m, cfg)
        pts_ds = deskew.deskew(seg.points, seg.cols, seg.valid, t, st.imu,
                               cfg, orient_start=seg.orient_start,
                               orient_diff=seg.orient_diff)
        out_ds = deskew.deskew(seg.outlier_points, seg.outlier_cols,
                               seg.outlier_valid, t, st.imu, cfg,
                               orient_start=seg.orient_start,
                               orient_diff=seg.orient_diff)
        seg = seg._replace(points=pts_ds, outlier_points=out_ds)
        fc = extract_features(seg, cfg)
        odo, T_o2l = lo.odometry_step(st.odo, fc, cfg)

        # odometry association health AT the solved increment
        s_cp, s_pj, s_pl, s_pm, s_w = lo._associate_surf(odo.params, fc,
                                                         st.odo, cfg)
        c_cp, c_pj, c_pl, c_w = lo._associate_corner(odo.params, fc,
                                                     st.odo, cfg)
        from alego_tpu.ops.residuals import point_to_line
        _, J_c = point_to_line(odo.params, c_cp, c_pj, c_pl)
        Jxyyaw = J_c[:, jnp.array([0, 1, 5])] * c_w[:, None]
        H = Jxyyaw.T @ Jxyyaw
        eigs = jnp.linalg.eigvalsh(H)

        from alego_tpu.models import laser_mapping as lm
        do_map = (st.frame % cfg.map_frame_decimation) == 0

        def run_mapping(ms):
            ms, _ = lm.mapping_step(
                ms, T_o2l, fc.less_sharp_pts, fc.less_sharp_valid,
                fc.less_flat_pts, fc.less_flat_valid,
                seg.outlier_points, seg.outlier_valid, t, cfg)
            return ms

        mapping = jax.lax.cond(do_map, run_mapping, lambda x: x, st.mapping)
        T_m2l = mapping.T_map2odom @ T_o2l
        new = pl.SlamState(odo=odo, mapping=mapping, frame=st.frame + 1,
                           T_odom2laser=T_o2l, imu=st.imu)
        diag = dict(
            n_seg=jnp.sum(seg.valid), n_out=jnp.sum(seg.outlier_valid),
            ground_frac=jnp.sum(seg.ground & seg.valid)
            / jnp.maximum(jnp.sum(seg.valid), 1),
            n_sharp=jnp.sum(fc.sharp_valid),
            n_less_sharp=jnp.sum(fc.less_sharp_valid),
            n_flat=jnp.sum(fc.flat_valid),
            n_less_flat=jnp.sum(fc.less_flat_valid),
            n_surf_corr=jnp.sum(s_w), n_corner_corr=jnp.sum(c_w),
            h_eig_min=eigs[0], h_eig_mid=eigs[1], h_eig_max=eigs[2],
            T_odom=T_o2l, T_map=T_m2l,
        )
        return new, diag

    def run(state, pts, msk, times):
        return jax.lax.scan(step, state, (pts, msk, times))

    return jax.jit(run)


def windowed_rpe(est, gt, w=50):
    """Relative error accumulated per w-frame window: drift rate localiser."""
    out = []
    for a in range(0, len(est) - w, w):
        b = a + w
        d_est = np.linalg.inv(est[a]) @ est[b]
        d_gt = np.linalg.inv(gt[a]) @ gt[b]
        err = np.linalg.inv(d_gt) @ d_est
        out.append(dict(
            start=a, end=b,
            trans=float(np.linalg.norm(err[:3, 3])),
            yaw_deg=float(np.degrees(np.arctan2(err[1, 0], err[0, 0]))),
        ))
    return out


def run_budget(n_frames, seeds):
    cfg = make_cfg()
    fn = diag_sequence(cfg)
    out = {}
    for variant in VARIANTS[:seeds]:
        pts, mask, poses, imu, tag = load_variant(variant, n_frames, cfg)
        state = pl.init_state(cfg)._replace(imu=prefill_imu(imu, cfg))
        times = jnp.arange(n_frames, dtype=jnp.float32) * cfg.scan_period
        t0 = time.time()
        state, diag = fn(state, jnp.asarray(pts), jnp.asarray(mask), times)
        diag = {k: np.asarray(v) for k, v in diag.items()}
        wall = time.time() - t0
        est = diag["T_map"]
        T0inv = np.linalg.inv(poses[0])
        gt = np.einsum("ij,njk->nik", T0inv, poses)
        ate = float(ate_rmse(est[:, :3, 3], gt[:, :3, 3], align=False))
        rpe = windowed_rpe(est, gt)
        odo_rpe = windowed_rpe(diag["T_odom"], gt)

        def stats(k):
            v = diag[k].astype(np.float64)
            return dict(mean=round(float(v.mean()), 2),
                        p10=round(float(np.percentile(v, 10)), 2),
                        min=round(float(v.min()), 2))

        out[tag] = dict(
            wall_s=round(wall, 1), ate_preloop=round(ate, 3),
            seg=dict(n_seg=stats("n_seg"), n_out=stats("n_out"),
                     ground_frac=stats("ground_frac")),
            features=dict(sharp=stats("n_sharp"),
                          less_sharp=stats("n_less_sharp"),
                          flat=stats("n_flat"),
                          less_flat=stats("n_less_flat")),
            odometry=dict(surf_corr=stats("n_surf_corr"),
                          corner_corr=stats("n_corner_corr"),
                          h_eig_min=stats("h_eig_min"),
                          h_eig_max=stats("h_eig_max")),
            rpe_map_windows=rpe,
            rpe_odom_windows=odo_rpe,
        )
        print(tag, "ate_preloop", ate, f"({wall:.0f}s)")
    path = os.path.join(REPO, "benchmarks", "error_budget.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


# ---------------------------------------------------------------------------
# knob A/B (pre-loop ATE; loop disabled to isolate odometry+mapping drift)
# ---------------------------------------------------------------------------

AB_CONFIGS = [
    ("baseline", dict()),
    ("prior5", dict(odom_prior_weight=5.0)),
    ("prior20", dict(odom_prior_weight=20.0)),
    ("floor5", dict(odom_eig_floor=5.0)),
    ("dense", dict(odom_dense_corners=True)),
    ("prior5+dense", dict(odom_prior_weight=5.0, odom_dense_corners=True)),
    ("prior5+floor5", dict(odom_prior_weight=5.0, odom_eig_floor=5.0)),
]


def run_ab(n_frames, seeds):
    results = {}
    for name, kw in AB_CONFIGS:
        cfg = make_cfg(loop_closure_enabled=False, **kw)
        scan = jax.jit(lambda st, p, m, t, _cfg=cfg:
                       pl.scan_sequence(st, p, m, t, _cfg))
        ates = []
        for variant in VARIANTS[:seeds]:
            pts, mask, poses, imu, tag = load_variant(variant, n_frames, cfg)
            state = pl.init_state(cfg)._replace(imu=prefill_imu(imu, cfg))
            times = jnp.arange(n_frames, dtype=jnp.float32) * cfg.scan_period
            t0 = time.time()
            state, est = scan(state, jnp.asarray(pts), jnp.asarray(mask),
                              times)
            est = np.asarray(est)
            wall = time.time() - t0
            T0inv = np.linalg.inv(poses[0])
            gt = np.einsum("ij,njk->nik", T0inv, poses)
            ate = float(ate_rmse(est[:, :3, 3], gt[:, :3, 3], align=False))
            ates.append(round(ate, 3))
            print(f"{name} {tag}: ate {ate:.3f} ({wall:.0f}s)")
        results[name] = dict(ates=ates, median=sorted(ates)[len(ates) // 2],
                             worst=max(ates))
    path = os.path.join(REPO, "benchmarks", "error_budget_ab.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    args = sys.argv[1:]
    n_frames = (int(args[args.index("--frames") + 1])
                if "--frames" in args else 240)
    seeds = int(args[args.index("--seeds") + 1]) if "--seeds" in args else 2
    if "--ab" in args:
        run_ab(n_frames, seeds)
    else:
        run_budget(n_frames, seeds)
