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

Writes benchmarks/validation_run.json and leaves the bag + outputs in
benchmarks/validation_out/.

Usage: python benchmarks/validate_simlidar.py [n_frames]
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


def synth_imu(n_frames: int, cfg, speed: float, seed: int = 7):
    """Noisy IMU stream along the circuit: orientation (yaw, sigma 0.3 deg)
    + body-frame accelerations incl. gravity (sigma 0.05 m/s^2), 40 Hz —
    what a mid-grade MEMS unit on the platform would record."""
    from alego_tpu.utils import sensor_sim as ss

    sub = IMU_HZ * cfg.scan_period               # samples per frame
    assert sub == int(sub)
    sub = int(sub)
    fine = ss.street_circuit(n_frames * sub, half=46.0, speed=speed / sub)
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


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    speed = 1.4

    from alego_tpu.config import PipelineConfig
    from alego_tpu.utils import sensor_sim as ss
    from alego_tpu.utils.rosbag import write_bag_pointclouds
    from alego_tpu.utils.metrics import ate_rmse
    from alego_tpu.cli import main as cli_main

    cfg = PipelineConfig()
    out_dir = os.path.join(REPO, "benchmarks", "validation_out")
    os.makedirs(out_dir, exist_ok=True)
    bag_path = os.path.join(out_dir, "urban_sim.bag")

    poses = ss.street_circuit(n_frames, half=46.0, speed=speed)
    cache = os.path.join(REPO, "benchmarks",
                         f"_sim_cache_{n_frames}_{cfg.horizon_scan}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        pts, mask = d["pts"], d["mask"]
    else:
        scene = ss.make_urban_scene(seed=3)
        t0 = time.time()
        pts, mask = ss.simulate_sequence(scene, poses, cfg, seed=0)
        print(f"simulated {n_frames} frames in {time.time() - t0:.0f}s "
              f"(mean {mask.sum(1).mean():.0f} pts/frame)")
        np.savez(cache, pts=pts, mask=mask)

    if not os.path.exists(bag_path) or "--rewrite-bag" in sys.argv:
        clouds = [(k * cfg.scan_period, pts[k][mask[k]])
                  for k in range(n_frames)]
        imu = synth_imu(n_frames, cfg, speed)
        write_bag_pointclouds(bag_path, clouds, topic="/lslidar_point_cloud",
                              imu=imu)
        print(f"wrote {bag_path} ({os.path.getsize(bag_path) / 2**20:.1f} MiB)")

    t0 = time.time()
    cli_args = ["--bag", bag_path, "--output", out_dir, "--viz", "--save-map"]
    if "--no-imu" not in sys.argv:
        cli_args.append("--use-imu")
    if "--nodelet" in sys.argv:
        # the reference's nodelet variant: loop radius 20 m / fitness 0.4
        # (laserMapping.cpp:76-78) — the wider gate for rougher conditions
        cli_args += ["--preset", "nodelet"]
        cfg = __import__("alego_tpu.config", fromlist=["x"]).nodelet_config()
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
    # also the standard aligned ATE (real-data practice: gt frame differs)
    ate_aligned = float(ate_rmse(est_xyz, gt_xyz, align=True))

    # loop/keyframe stats from the saved checkpoint
    ck = np.load(os.path.join(out_dir, "state.npz"), allow_pickle=True)
    import jax
    from alego_tpu.models.pipeline import SlamPipeline
    pipe = SlamPipeline(cfg)
    pipe.load_checkpoint(os.path.join(out_dir, "state.npz"))
    kf = int(pipe.state.mapping.graph.count)
    loops = int(pipe.state.mapping.graph.loop_count)
    attempts = int(pipe.state.mapping.loop_attempts)
    best_fit = float(pipe.state.mapping.loop_best_fitness)

    result = dict(n_frames=int(len(est_xyz)), ate_unaligned=round(ate, 3),
                  ate_aligned=round(ate_aligned, 3), keyframes=kf,
                  loops=loops, loop_attempts=attempts,
                  best_fitness=round(best_fit, 3),
                  preset="nodelet" if "--nodelet" in sys.argv else "standalone",
                  use_imu="--no-imu" not in sys.argv,
                  wall_s=round(wall, 1),
                  bag_mib=round(os.path.getsize(bag_path) / 2**20, 1),
                  source="independent urban simulation (utils/sensor_sim)")
    with open(os.path.join(REPO, "benchmarks", "validation_run.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
