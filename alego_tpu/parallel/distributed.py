"""Full-sequence distributed single-map SLAM (SURVEY §7 phase 7).

``parallel/sharded_mapping`` proves ONE mapping step and ONE loop solve
match the single-device path; this module drives a WHOLE TRAJECTORY through
them.  One map, one pose graph, D devices:

* stage 1/2 (projection, de-skew, features, scan-to-scan odometry) run
  replicated — they are single-frame sequential work with no map state;
* the scan-to-map 5-NN association runs on the spatially row-sharded map
  store (``parallel/map_shard``: per-device distance matrices over 1/D of
  the map, O(D*Q*k) candidate merge);
* loop-closure pose-graph solves run on the distributed Schur solver
  (``parallel/schur``: sharded pose rows, ppermute halos, one
  separator-sized psum).

The cadence gates the single-device ``pipeline.slam_step`` expresses with
``lax.cond`` (mapping decimation LM.cpp:244-245, the 1 Hz loop thread
LM.cpp:779-794) are hoisted to the HOST here — the reference itself runs
loop closure on a separate thread, and keeping the collective-bearing
programs out of ``cond`` branches keeps each one a clean SPMD program.
The math executed per frame is identical to ``slam_step`` in the same
order: front → (mapping?) → (loop?) → pose composition; equality over a
full closed-loop sequence is asserted in tests/test_distributed_pipeline.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import PipelineConfig
from ..models import laser_odometry as lo
from ..models import laser_mapping as lm
from ..models import pipeline as pl
from ..models.image_projection import image_projection
from ..ops import deskew
from ..ops.features import extract_features
from . import sharded_mapping as sm
from .multichip import make_mesh


def make_front_step(cfg: PipelineConfig):
    """Jitted stage-1/2 front half of ``pipeline.slam_step`` (projection,
    de-skew, features, odometry) — everything BEFORE the map state.

    Returns fn: (odo_state, imu_buf, points, mask, time) ->
    (odo_state, T_odom2laser, fc, seg)."""

    def _front(odo, imu, points, mask, time):
        seg = image_projection(points, mask, cfg)
        if cfg.use_imu or cfg.use_odom:
            pts_ds = deskew.deskew(seg.points, seg.cols, seg.valid, time,
                                   imu, cfg, orient_start=seg.orient_start,
                                   orient_diff=seg.orient_diff)
            out_ds = deskew.deskew(seg.outlier_points, seg.outlier_cols,
                                   seg.outlier_valid, time, imu, cfg,
                                   orient_start=seg.orient_start,
                                   orient_diff=seg.orient_diff)
            seg = seg._replace(points=pts_ds, outlier_points=out_ds)
        fc = extract_features(seg, cfg)
        odo, T = lo.odometry_step(odo, fc, cfg)
        return odo, T, fc, seg

    return jax.jit(_front)


class DistributedSlamPipeline:
    """Host driver for ONE SLAM instance whose map association and pose-graph
    solves are distributed over a device mesh.

    API mirrors ``models.pipeline.SlamPipeline`` (process / run / poses /
    export-ready ``state``); the per-frame result is bit-for-bit the
    single-device trajectory up to collective reduction order.
    """

    def __init__(self, cfg: PipelineConfig, n_devices: Optional[int] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        if n_devices is not None and len(jax.devices()) < n_devices:
            raise ValueError(
                f"asked for {n_devices} devices but only "
                f"{len(jax.devices())} visible — a silently smaller mesh "
                "would report distributed results that never left one "
                "device (set xla_force_host_platform_device_count for a "
                "virtual CPU mesh)")
        self.mesh: Mesh = make_mesh(n_devices)
        self.n_devices = self.mesh.shape["data"]
        self._front = make_front_step(cfg)
        self._map_step = sm.make_sharded_mapping_step(cfg, self.mesh)
        if cfg.loop_closure_enabled:
            self._loop_step = sm.make_sharded_loop_closure_step(cfg, self.mesh)
        self._compose = jax.jit(lambda m2o, o2l: m2o @ o2l)
        self.state = pl.init_state(cfg, dtype)
        self.poses = []
        self._frame = 0
        self.loop_events = 0
        self.compactions = 0

    def _maybe_compact(self, margin: int = 16):
        """Keep-mapping-forever policy, mirroring SlamPipeline._maybe_compact:
        near capacity, decimate old keyframes (lm.compact_keyframes) so new
        territory keeps mapping instead of silently saturating
        ``max_keyframes``.  The compaction is graph-topology work with no
        map-association collectives, so the single-device program is the
        right tool even on a mesh."""
        if int(self.state.mapping.graph.count) < self.cfg.max_keyframes - margin:
            return
        if not hasattr(self, "_compact"):
            cfg = self.cfg
            self._compact = jax.jit(lambda ms: lm.compact_keyframes(ms, cfg),
                                    donate_argnums=0)
        self.state = self.state._replace(
            mapping=self._compact(self.state.mapping))
        self.compactions += 1

    def process(self, points: np.ndarray, mask: np.ndarray,
                time: Optional[float] = None):
        cfg = self.cfg
        t = jnp.asarray(self._frame * cfg.scan_period if time is None
                        else time, jnp.float32)
        odo, T_odom, fc, seg = self._front(
            self.state.odo, self.state.imu, jnp.asarray(points),
            jnp.asarray(mask), t)

        ms = self.state.mapping
        if self._frame % cfg.map_frame_decimation == 0:
            ms, _ = self._map_step(
                ms, T_odom, fc.less_sharp_pts, fc.less_sharp_valid,
                fc.less_flat_pts, fc.less_flat_valid,
                seg.outlier_points, seg.outlier_valid, t)
        if (cfg.loop_closure_enabled
                and self._frame % cfg.loop_every_n_frames == 0
                and int(ms.graph.count) > 1):
            ms, closed, _ = self._loop_step(ms)
            self.loop_events += int(closed)

        pose = self._compose(ms.T_map2odom, T_odom)
        self.state = self.state._replace(
            odo=odo, mapping=ms, frame=self.state.frame + 1,
            T_odom2laser=T_odom)
        self._frame += 1
        if self._frame % 16 == 0:
            self._maybe_compact()
        self.poses.append(pose)
        return pose

    def run(self, points_seq: np.ndarray, mask_seq: np.ndarray) -> np.ndarray:
        for k in range(points_seq.shape[0]):
            self.process(points_seq[k], mask_seq[k])
        return np.stack([np.asarray(p) for p in self.poses])
