"""Stage-level probe of the seed-2 divergence window (frames ~70-120).

seed_diag showed both odometry and mapping drifting ~0.15 m/frame in this
window.  This probe replays the front end + odometry manually and records,
per frame: feature counts, correspondence counts per family, and the
per-frame odometry increment error vs ground truth — to distinguish
feature starvation / association failure / solver degeneracy.
"""

import json
import os
import sys

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
from alego_tpu.models import laser_odometry as lo
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.ops import se3
from alego_tpu.utils import synthetic


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = PipelineConfig()
    n_frames = 192
    cache = os.path.join(REPO, "benchmarks",
                         f"_seq_cache_v2_{n_frames}_{cfg.horizon_scan}"
                         + ("" if seed == 0 else f"_s{seed}") + ".npz")
    d = np.load(cache)
    pts, mask = d["pts"], d["mask"]
    poses = synthetic.loop_trajectory(n_frames, radius=30.0, speed=1.6,
                                      closed=True)

    front = jax.jit(lambda p, m: extract_features(
        image_projection(p, m, cfg), cfg))

    @jax.jit
    def probe(st, fc):
        s_cp, s_pj, s_pl, s_pm, s_w = lo._associate_surf(st.params, fc, st, cfg)
        c_cp, c_pj, c_pl, c_w = lo._associate_corner(st.params, fc, st, cfg)
        return (jnp.sum(fc.sharp_valid), jnp.sum(fc.flat_valid),
                jnp.sum(fc.less_sharp_valid), jnp.sum(fc.less_flat_valid),
                jnp.sum(s_w > 0), jnp.sum(c_w > 0))

    step = jax.jit(lambda st, fc: lo.odometry_step(st, fc, cfg))

    st = lo.init_state(cfg)
    rows = []
    prev_est = np.eye(4)
    prev_gt = np.eye(4)
    for k in range(n_frames):
        fc = front(jnp.asarray(pts[k]), jnp.asarray(mask[k]))
        ns, nf, nls, nlf, nsc, ncc = (int(x) for x in probe(st, fc))
        st, pose = step(st, fc)
        est = np.asarray(pose)
        # per-frame increment error: ||(prev_est^-1 est) - (prev_gt^-1 gt)||
        inc_est = np.linalg.inv(prev_est) @ est
        inc_gt = np.linalg.inv(prev_gt) @ poses[k]
        inc_err = float(np.linalg.norm(inc_est[:3, 3] - inc_gt[:3, 3]))
        yaw_est = np.arctan2(inc_est[1, 0], inc_est[0, 0])
        yaw_gt = np.arctan2(inc_gt[1, 0], inc_gt[0, 0])
        rows.append(dict(
            frame=k, sharp=ns, flat=nf, less_sharp=nls, less_flat=nlf,
            surf_corr=nsc, corner_corr=ncc,
            inc_err=round(inc_err, 4),
            yaw_inc_err=round(float(yaw_est - yaw_gt), 5),
            err=round(float(np.linalg.norm(est[:3, 3] - poses[k][:3, 3])), 3),
        ))
        prev_est, prev_gt = est, poses[k]
        if k % 16 == 0:
            r = rows[-1]
            print(f"f{k}: sharp={ns} flat={nf} s_corr={nsc} c_corr={ncc} "
                  f"inc_err={r['inc_err']} err={r['err']}", flush=True)

    out = os.path.join(REPO, "benchmarks", f"seed2_probe_s{seed}.json")
    with open(out, "w") as f:
        json.dump(rows, f)
    print("wrote", out)
    # summary over the bad window
    win = [r for r in rows if 70 <= r["frame"] <= 120]
    pre = [r for r in rows if 10 <= r["frame"] <= 60]
    for name, rs in (("pre  10-60 ", pre), ("bad 70-120", win)):
        print(name, "sharp median", int(np.median([r["sharp"] for r in rs])),
              "corner_corr median", int(np.median([r["corner_corr"] for r in rs])),
              "surf_corr median", int(np.median([r["surf_corr"] for r in rs])),
              "inc_err median", round(float(np.median([r["inc_err"] for r in rs])), 4),
              "yaw_inc median", round(float(np.median([abs(r["yaw_inc_err"]) for r in rs])), 5))


if __name__ == "__main__":
    main()
