"""End-to-end validation on the INDEPENDENT realistic sensor simulation.

No real 16-beam dataset is reachable here (zero egress; the reference repo
snapshot ships without its bags — see REALDATA.md).  This harness is the
closest available substitute for the reference's bag-replay validation
(README.md:27-41): data comes from the second, independently written sensor
simulator (utils/sensor_sim.py — urban scene, beam divergence, quantization,
incidence dropout, spurious returns, rolling shutter), gets written into a
REAL rosbag v2.0 file, and is replayed through the production CLI path
(cli --bag -> pure-Python bag parser -> SlamPipeline) with loop closure on,
exactly as a user would replay a recorded log.

MULTI-SEED (round-4): accuracy artifacts follow the same discipline as
bench.py's PRIMARY line — several scene/sensor/IMU seeds and speeds, with
median/worst aggregates, not a single lucky run.

Writes benchmarks/validation_run.json and leaves bags + outputs in
benchmarks/validation_out/.

Usage:
  python benchmarks/validate_simlidar.py [n_frames] [--seeds K] [--no-imu]
                                         [--nodelet] [--rewrite-bag]
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


IMU_HZ = 40

# (scene_seed, sim_seed, imu_seed, speed m/frame, circuit half-extent m)
VARIANTS = [
    (3, 0, 7, 1.4, 46.0),      # the round-3 route (cache exists)
    (11, 5, 13, 1.8, 46.0),    # faster platform, new scene draw
    (23, 9, 29, 1.1, 38.0),    # slower, tighter circuit, new scene
]


def synth_imu(n_frames: int, cfg, speed: float, half: float, seed: int = 7):
    """Noisy IMU stream along the circuit: orientation (yaw, sigma 0.3 deg)
    + body-frame accelerations incl. gravity (sigma 0.05 m/s^2), 40 Hz —
    what a mid-grade MEMS unit on the platform would record."""
    from alego_tpu.utils import sensor_sim as ss

    sub = IMU_HZ * cfg.scan_period               # samples per frame
    assert sub == int(sub)
    sub = int(sub)
    fine = ss.street_circuit(n_frames * sub, half=half, speed=speed / sub)
    dt = 1.0 / IMU_HZ
    pos = fine[:, :3, 3]
    yaw = np.unwrap(np.arctan2(fine[:, 1, 0], fine[:, 0, 0]))
    vel = np.gradient(pos, dt, axis=0)
    acc_w = np.gradient(vel, dt, axis=0)
    rng = np.random.default_rng(seed)
    out = []
    G = 9.81
    for i in range(len(fine)):
        cy, sy = np.cos(yaw[i]), np.sin(yaw[i])
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        acc_b = Rz.T @ acc_w[i] + [0, 0, G] + rng.normal(0, 0.05, 3)
        rpy = np.array([0.0, 0.0, yaw[i]]) + rng.normal(0, np.radians(0.3), 3)
        out.append((i * dt, rpy, acc_b))
    return out


def run_variant(variant, n_frames, cfg, use_imu, nodelet, rewrite):
    from alego_tpu.utils import sensor_sim as ss
    from alego_tpu.utils.rosbag import write_bag_pointclouds
    from alego_tpu.utils.metrics import ate_rmse
    from alego_tpu.cli import main as cli_main
    from alego_tpu.models.pipeline import SlamPipeline

    scene_seed, sim_seed, imu_seed, speed, half = variant
    tag = f"s{scene_seed}_{sim_seed}"
    out_dir = os.path.join(REPO, "benchmarks", "validation_out", tag)
    os.makedirs(out_dir, exist_ok=True)
    bag_path = os.path.join(out_dir, "urban_sim.bag")

    poses = ss.street_circuit(n_frames, half=half, speed=speed)
    cache = os.path.join(
        REPO, "benchmarks",
        f"_sim_cache_{n_frames}_{cfg.horizon_scan}_{tag}.npz")
    legacy = os.path.join(REPO, "benchmarks",
                          f"_sim_cache_{n_frames}_{cfg.horizon_scan}.npz")
    if tag == "s3_0" and not os.path.exists(cache) and os.path.exists(legacy):
        cache = legacy
    if os.path.exists(cache):
        d = np.load(cache)
        pts, mask = d["pts"], d["mask"]
    else:
        scene = ss.make_urban_scene(seed=scene_seed, half=half)
        t0 = time.time()
        pts, mask = ss.simulate_sequence(scene, poses, cfg, seed=sim_seed)
        print(f"[{tag}] simulated {n_frames} frames in "
              f"{time.time() - t0:.0f}s "
              f"(mean {mask.sum(1).mean():.0f} pts/frame)")
        np.savez(cache, pts=pts, mask=mask)

    if not os.path.exists(bag_path) or rewrite:
        clouds = [(k * cfg.scan_period, pts[k][mask[k]])
                  for k in range(n_frames)]
        imu = synth_imu(n_frames, cfg, speed, half, seed=imu_seed)
        write_bag_pointclouds(bag_path, clouds, topic="/lslidar_point_cloud",
                              imu=imu)
        print(f"[{tag}] wrote {bag_path} "
              f"({os.path.getsize(bag_path) / 2**20:.1f} MiB)")

    t0 = time.time()
    cli_args = ["--bag", bag_path, "--output", out_dir, "--viz", "--save-map"]
    if use_imu:
        cli_args.append("--use-imu")
    if nodelet:
        cli_args += ["--preset", "nodelet"]
    rc = cli_main(cli_args)
    assert rc == 0
    wall = time.time() - t0

    tum = np.loadtxt(os.path.join(out_dir, "trajectory_tum.txt"))
    est_xyz = tum[:, 1:4]
    # the SLAM estimate lives in the FIRST-SCAN frame; express ground truth
    # relative to the first pose before comparing
    T0inv = np.linalg.inv(poses[0])
    gt_rel = np.einsum("ij,njk->nik", T0inv, poses[: len(est_xyz)])
    gt_xyz = gt_rel[:, :3, 3]
    ate = float(ate_rmse(est_xyz, gt_xyz, align=False))
    ate_aligned = float(ate_rmse(est_xyz, gt_xyz, align=True))
    path_len = float(np.linalg.norm(np.diff(gt_xyz, axis=0), axis=1).sum())

    pipe = SlamPipeline(cfg)
    pipe.load_checkpoint(os.path.join(out_dir, "state.npz"))
    ms = pipe.state.mapping

    # corrected keypose-path ATE: correctPoses (LM.cpp:706-730) rewrites the
    # keyframe poses retroactively on loop closure; the STREAMED per-frame
    # trajectory above never benefits (poses are emitted once), so this is
    # the number comparable to evaluating the reference's final map path
    n_kf = int(ms.graph.count)
    kf_xyz = np.asarray(ms.graph.poses)[:n_kf, :3, 3]
    kf_t = np.asarray(ms.kf_times)[:n_kf]
    gt_idx = np.clip(np.round(kf_t / cfg.scan_period).astype(int), 0,
                     len(gt_xyz) - 1)
    kf_ate = float(ate_rmse(kf_xyz, gt_xyz[gt_idx], align=False))

    return dict(
        tag=tag, scene_seed=scene_seed, sim_seed=sim_seed,
        imu_seed=imu_seed, speed=speed, half=half,
        n_frames=int(len(est_xyz)),
        ate_unaligned=round(ate, 3), ate_aligned=round(ate_aligned, 3),
        kf_ate_corrected=round(kf_ate, 3),
        kf_drift_pct=round(100.0 * kf_ate / max(path_len, 1e-9), 2),
        drift_pct=round(100.0 * ate / max(path_len, 1e-9), 2),
        path_len=round(path_len, 1),
        keyframes=int(ms.graph.count),
        loops=int(ms.graph.loop_count),
        loop_attempts=int(ms.loop_attempts),
        best_fitness=round(float(ms.loop_best_fitness), 3),
        best_inlier=round(float(ms.loop_best_inlier), 3),
        wall_s=round(wall, 1),
        fps=round(len(est_xyz) / max(wall, 1e-9), 2),
    )


def main():
    args = [a for a in sys.argv[1:]]
    n_frames = int(args[0]) if args and args[0].isdigit() else 240
    n_seeds = (int(args[args.index("--seeds") + 1])
               if "--seeds" in args else len(VARIANTS))
    use_imu = "--no-imu" not in args
    nodelet = "--nodelet" in args
    rewrite = "--rewrite-bag" in args

    from alego_tpu.config import PipelineConfig, nodelet_config
    cfg = nodelet_config() if nodelet else PipelineConfig()

    runs = []
    for variant in VARIANTS[:n_seeds]:
        r = run_variant(variant, n_frames, cfg, use_imu, nodelet, rewrite)
        print(json.dumps(r))
        runs.append(r)

    ates = sorted(r["ate_unaligned"] for r in runs)
    drifts = sorted(r["drift_pct"] for r in runs)
    kf_ates = sorted(r["kf_ate_corrected"] for r in runs)
    kf_drifts = sorted(r["kf_drift_pct"] for r in runs)
    result = dict(
        n_frames=n_frames,
        seeds=runs,
        ate_median=ates[len(ates) // 2],
        ate_worst=ates[-1],
        kf_ate_median=kf_ates[len(kf_ates) // 2],
        kf_ate_worst=kf_ates[-1],
        kf_drift_pct_median=kf_drifts[len(kf_drifts) // 2],
        kf_drift_pct_worst=kf_drifts[-1],
        drift_pct_median=drifts[len(drifts) // 2],
        drift_pct_worst=drifts[-1],
        loops_total=sum(r["loops"] for r in runs),
        seeds_with_loop=sum(1 for r in runs if r["loops"] > 0),
        preset="nodelet" if nodelet else "standalone",
        use_imu=use_imu,
        source="independent urban simulation (utils/sensor_sim), "
               "multi-seed bag replay through the production CLI",
    )
    with open(os.path.join(REPO, "benchmarks", "validation_run.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "seeds"}))


if __name__ == "__main__":
    main()
