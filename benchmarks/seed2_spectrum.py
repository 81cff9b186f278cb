"""Odometry GN Hessian spectrum along the seed-2 replay.

seed2_probe showed the failure is a 7x per-frame increment error with
normal feature/correspondence counts; the error direction is along-track
(seed_diag position decomposition).  This probe measures the (x, y, yaw)
spectrum of the joint step-B Hessian at the converged step-A params each
frame, to confirm a weak-eigenvalue window and calibrate an odometry
eigen floor (LOAM isDegenerate analog; gauss_newton.degeneracy_projector).
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
from alego_tpu.ops.gauss_newton import (solve_gn, huber_weight, SURF_DIMS,
                                        STEP_B_DIMS)
from alego_tpu.ops.residuals import point_to_line, point_to_plane_3pt


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = PipelineConfig()
    n_frames = 192
    cache = os.path.join(REPO, "benchmarks",
                         f"_seq_cache_v2_{n_frames}_{cfg.horizon_scan}"
                         + ("" if seed == 0 else f"_s{seed}") + ".npz")
    d = np.load(cache)
    pts, mask = d["pts"], d["mask"]

    front = jax.jit(lambda p, m: extract_features(
        image_projection(p, m, cfg), cfg))

    @jax.jit
    def spectrum(st, fc):
        """Replicates odometry_step's step A then measures step-B H."""
        s_cp, s_pj, s_pl, s_pm, s_w = lo._associate_surf(st.params, fc, st, cfg)

        def surf_res(p):
            r, J = point_to_plane_3pt(p, s_cp, s_pj, s_pl, s_pm)
            return r, J, s_w

        params_a = solve_gn(surf_res, st.params, cfg.odom_surf_iters,
                            SURF_DIMS, cfg.huber_delta,
                            min_count=cfg.min_correspondences)
        c_cp, c_pj, c_pl, c_w = lo._associate_corner(params_a, fc, st, cfg)
        r_c, J_c = point_to_line(params_a, c_cp, c_pj, c_pl)
        corner_dims = jnp.array([1, 1, 0, 0, 0, 1], J_c.dtype)
        J_c = J_c * corner_dims[None, :]
        hw = c_w * huber_weight(r_c, cfg.huber_delta)
        H = J_c.T @ (J_c * hw[:, None])
        # (x, y, yaw) block spectrum of the corner system (the only
        # constraints on x/y/yaw in the two-step split)
        Hxyy = H[jnp.ix_(jnp.array([0, 1, 5]), jnp.array([0, 1, 5]))]
        lam, V = jnp.linalg.eigh(Hxyy)
        return params_a, lam, V, jnp.sum(c_w > 0)

    step = jax.jit(lambda st, fc: lo.odometry_step(st, fc, cfg))

    st = lo.init_state(cfg)
    rows = []
    for k in range(min(n_frames, 160)):
        fc = front(jnp.asarray(pts[k]), jnp.asarray(mask[k]))
        _, lam, V, ncc = spectrum(st, fc)
        st, pose = step(st, fc)
        lam = np.asarray(lam)
        V = np.asarray(V)
        rows.append(dict(frame=k, lam=[round(float(x), 2) for x in lam],
                         vmin=[round(float(x), 3) for x in V[:, 0]],
                         ncc=int(ncc)))
        if k % 8 == 0:
            print(f"f{k}: lam={rows[-1]['lam']} vmin={rows[-1]['vmin']} "
                  f"ncc={int(ncc)}", flush=True)

    out = os.path.join(REPO, "benchmarks", f"seed2_spectrum_s{seed}.json")
    with open(out, "w") as f:
        json.dump(rows, f)
    print("wrote", out)
    good = [r for r in rows if 10 <= r["frame"] <= 60]
    bad = [r for r in rows if 78 <= r["frame"] <= 110]
    for name, rs in (("good", good), ("bad ", bad)):
        lmin = [r["lam"][0] for r in rs]
        print(f"{name}: lam_min median {np.median(lmin):.2f} "
              f"min {min(lmin):.2f} max {max(lmin):.2f}")


if __name__ == "__main__":
    main()
