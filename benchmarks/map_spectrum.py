"""Scan-to-map Hessian spectrum + association health along a seed replay.

seed_diag showed err_map growing FASTER than err_odo in the seed-2 window
(frames 80-112) — scan-to-map made things worse.  Two candidate mechanisms:
(a) the mapping H itself has a weak direction there (slide), or (b)
association lock-in to a ghosted map.  This probe replays the full pipeline
and, each mapping frame, recomputes the first-iteration mapping system from
the pre-step state: 6-DoF H spectrum, line/plane constraint counts, and
residual RMS.
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
from alego_tpu.models import pipeline, laser_odometry as lo, laser_mapping as lm
from alego_tpu.models.image_projection import image_projection
from alego_tpu.ops.features import extract_features
from alego_tpu.ops import se3
from alego_tpu.ops.knn import knn_best as knn
from alego_tpu.ops.eig3 import pca_line_fit, plane_fit
from alego_tpu.ops.residuals import point_to_line, point_to_plane_fitted
from alego_tpu.ops.gauss_newton import huber_weight
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
    odo_only = jax.jit(lambda st, fc: lo.odometry_step(st, fc, cfg))
    step = jax.jit(lambda st, p, m, t: pipeline.slam_step(st, p, m, t, cfg))

    @jax.jit
    def probe(ms, T_odom, fc, outlier_pts, outlier_valid):
        T_pred = ms.T_map2odom @ T_odom
        # rebuild the local map exactly as mapping_step would
        mc, mco, msf, msfo = lm._build_local_map(ms, cfg, T_pred)
        (c_ds, c_ok, s_ds, s_ok, o_ds, o_ok, st_ds, st_ok) = lm._downsample_scan(
            fc.less_sharp_pts, fc.less_sharp_valid,
            fc.less_flat_pts, fc.less_flat_valid,
            outlier_pts, outlier_valid, cfg)
        params = se3.mat_to_params(T_pred)
        sel_c = se3.transform_points(params, c_ds)
        d_c, i_c = knn(sel_c, c_ok, mc, mco, cfg.map_knn, chunk=cfg.knn_chunk)
        near_c = c_ok & (d_c[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        nbrs = mc[i_c]
        center, direction, ev = pca_line_fit(nbrs, jnp.ones_like(d_c, bool))
        is_line = ev[:, 2] > cfg.line_eig_ratio * ev[:, 1]
        pj = center + 0.1 * direction
        pl = center - 0.1 * direction
        w_line = (near_c & is_line).astype(params.dtype)
        sel_s = se3.transform_points(params, st_ds)
        d_s, i_s = knn(sel_s, st_ok, msf, msfo, cfg.map_knn, chunk=cfg.knn_chunk)
        near_s = st_ok & (d_s[:, cfg.map_knn - 1] < cfg.map_nn_max_dist_sq)
        nbrs_s = msf[i_s]
        unit_n, d0, plane_ok = plane_fit(nbrs_s, jnp.ones_like(d_s, bool),
                                         cfg.plane_fit_tol)
        w_plane = (near_s & plane_ok).astype(params.dtype)
        r_c, J_c = point_to_line(params, c_ds, pj, pl)
        r_s, J_s = point_to_plane_fitted(params, st_ds, unit_n, d0)
        r = jnp.concatenate([r_c, r_s])
        J = jnp.concatenate([J_c, J_s])
        w = jnp.concatenate([w_line, w_plane])
        hw = w * huber_weight(r, cfg.huber_delta)
        H = J.T @ (J * hw[:, None])
        lam, V = jnp.linalg.eigh(H)
        rms = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1))
        bad = jnp.stack([
            jnp.sum(~jnp.isfinite(r_c)), jnp.sum(~jnp.isfinite(J_c)),
            jnp.sum(~jnp.isfinite(r_s)), jnp.sum(~jnp.isfinite(J_s)),
            jnp.sum(~jnp.isfinite(mc)), jnp.sum(~jnp.isfinite(msf)),
            jnp.sum(~jnp.isfinite(c_ds)), jnp.sum(~jnp.isfinite(st_ds)),
            jnp.sum(~jnp.isfinite(unit_n)), jnp.sum(~jnp.isfinite(d0)),
            jnp.sum(~jnp.isfinite(pj)), jnp.sum(~jnp.isfinite(T_pred)),
            jnp.sum(~jnp.isfinite(ms.kf_surf)),
            jnp.sum(~jnp.isfinite(ms.graph.poses)),
        ])
        return (lam, V[:, 0], jnp.sum(w_line > 0), jnp.sum(w_plane > 0), rms,
                bad)

    state = pipeline.init_state(cfg)
    rows = []
    for k in range(min(n_frames, 160)):
        p_d, m_d = jnp.asarray(pts[k]), jnp.asarray(mask[k])
        if k % cfg.map_frame_decimation == 0 and k > 0:
            fc = front(p_d, m_d)
            # seg outliers needed: recompute through image_projection
            seg = jax.jit(lambda p, m: image_projection(p, m, cfg))(p_d, m_d)
            _, T_odom = odo_only(state.odo, fc)
            lam, vmin, nl, npl, rms, bad = probe(
                state.mapping, T_odom, fc, seg.outlier_points,
                seg.outlier_valid)
            lam = np.asarray(lam)
            bad = np.asarray(bad).tolist()
            rows.append(dict(
                frame=k, lam=[round(float(x), 1) for x in lam],
                vmin=[round(float(x), 3) for x in np.asarray(vmin)],
                n_line=int(nl), n_plane=int(npl),
                rms=round(float(rms), 4), bad=bad))
            names = ("r_c", "J_c", "r_s", "J_s", "map_c", "map_s", "c_ds",
                     "st_ds", "unit_n", "d0", "pj", "T_pred", "kf_surf",
                     "poses")
            if k % 16 == 0 or any(bad):
                r = rows[-1]
                nz = {n: b for n, b in zip(names, bad) if b}
                print(f"f{k}: lam_min={r['lam'][0]} lines={r['n_line']} "
                      f"planes={r['n_plane']} rms={r['rms']} nonfinite={nz}",
                      flush=True)
        state, _ = step(state, p_d, m_d, jnp.float32(k * cfg.scan_period))

    out = os.path.join(REPO, "benchmarks", f"map_spectrum_s{seed}.json")
    with open(out, "w") as f:
        json.dump(rows, f)
    print("wrote", out)
    good = [r for r in rows if 10 <= r["frame"] <= 60]
    bad = [r for r in rows if 78 <= r["frame"] <= 110]
    for name, rs in (("good", good), ("bad ", bad)):
        lmin = [r["lam"][0] for r in rs]
        rmss = [r["rms"] for r in rs]
        print(f"{name}: lam_min median {np.median(lmin):.1f} "
              f"min {min(lmin):.1f}; rms median {np.median(rmss):.4f}; "
              f"lines {np.median([r['n_line'] for r in rs]):.0f} "
              f"planes {np.median([r['n_plane'] for r in rs]):.0f}")


if __name__ == "__main__":
    main()
