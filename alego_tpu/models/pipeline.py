"""End-to-end SLAM pipeline: one jittable step for the whole system.

The reference runs three OS processes connected by ROS pub/sub with queue
depth 10 (SURVEY §1 L3/L5).  TPU-native, the entire frame -> pose dataflow —
projection, segmentation, features, scan-to-scan odometry, scan-to-map
mapping (every 2nd frame, LM.cpp:244-245), keyframing, loop closure — is a
single pure function ``slam_step(state, frame) -> (state, pose)`` compiled
once; serialization boundaries and queues disappear.

``SlamPipeline`` is the host-facing driver: it feeds padded scans, collects
trajectories, and exposes map export (the ``/save_map`` service equivalent,
LM.cpp:1007-1055) and checkpointing (absent in the reference — SURVEY §5.4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops.features import extract_features
from ..ops import deskew
from .image_projection import image_projection
from . import laser_odometry as lo
from . import laser_mapping as lm


class SlamState(NamedTuple):
    odo: lo.OdometryState
    mapping: lm.MappingState
    frame: jnp.ndarray          # int32 frame counter
    T_odom2laser: jnp.ndarray   # [4, 4] latest odometry pose
    imu: deskew.ImuBuffer       # IMU integration buffer (used if cfg.use_imu)


def init_state(cfg: PipelineConfig, dtype=jnp.float32) -> SlamState:
    return SlamState(
        odo=lo.init_state(cfg, dtype),
        mapping=lm.init_state(cfg, dtype),
        frame=jnp.int32(0),
        T_odom2laser=jnp.eye(4, dtype=dtype),
        imu=deskew.init_buffer(cfg.imu_queue_length, dtype),
    )


def slam_step(state: SlamState, points: jnp.ndarray, mask: jnp.ndarray,
              time: jnp.ndarray, cfg: PipelineConfig, do_map_static=None):
    """Process one raw scan. Returns (state, T_map2laser).

    ``do_map_static``: trace-time override of the every-2nd-frame mapping
    gate (LM.cpp:244-245).  ``None`` keeps the runtime ``lax.cond`` on
    ``state.frame`` — correct for any starting phase, but the cond routes
    the 100+ MiB keyframe store through a branch boundary, which measured
    1.45 ms/frame of copy tax inside ``lax.scan`` even when the branch
    never runs (benchmarks/scan_variants.py nomap vs frontscan).
    ``True``/``False`` burn the decision into the program — used by the
    decimation-aligned group scan below, where the phase is known
    statically."""
    # stage 1 + features
    seg = image_projection(points, mask, cfg)
    # static branch: de-skew the segmented cloud (LO.cpp:184; the odom-aided
    # variant LO.cpp:737-795 shares the buffer/interpolation path)
    if cfg.use_imu or cfg.use_odom:
        pts_ds = deskew.deskew(seg.points, seg.cols, seg.valid, time,
                               state.imu, cfg,
                               orient_start=seg.orient_start,
                               orient_diff=seg.orient_diff)
        # the outlier cloud must move with the segmented cloud: the surf map
        # merges both (LM.cpp:385-387) — de-skewing only one smears every
        # surface into two misaligned copies in the local map
        out_ds = deskew.deskew(seg.outlier_points, seg.outlier_cols,
                               seg.outlier_valid, time, state.imu, cfg,
                               orient_start=seg.orient_start,
                               orient_diff=seg.orient_diff)
        seg = seg._replace(points=pts_ds, outlier_points=out_ds)
    fc = extract_features(seg, cfg)

    # stage 2: scan-to-scan odometry
    odo, T_odom2laser = lo.odometry_step(state.odo, fc, cfg)

    # stage 3: mapping on every 2nd frame (LM.cpp:244-245)
    def run_mapping(ms):
        ms, _ = lm.mapping_step(
            ms, T_odom2laser,
            fc.less_sharp_pts, fc.less_sharp_valid,
            fc.less_flat_pts, fc.less_flat_valid,
            seg.outlier_points, seg.outlier_valid,
            time, cfg)
        return ms

    if do_map_static is None:
        do_map = (state.frame % cfg.map_frame_decimation) == 0
        mapping = jax.lax.cond(do_map, run_mapping, lambda m: m,
                               state.mapping)
    elif do_map_static:
        mapping = run_mapping(state.mapping)
    else:
        mapping = state.mapping

    # loop closure attempt on a TIME cadence — the reference's 1 Hz thread
    # (LM.cpp:779-794): every loop_every_n_frames input frames, independent
    # of keyframe count (a keyframe-parity gate could stall forever if the
    # count sat on the wrong residue while keyframes stopped arriving).
    # With loop_in_step=False the attempt is NOT lowered here — the host
    # driver runs it as its own jitted program between dispatches (see
    # PipelineConfig.loop_in_step), cutting the scan compile ~2-10x.
    if cfg.loop_closure_enabled and cfg.loop_in_step:
        do_loop = (mapping.graph.count > 1) & (
            state.frame % cfg.loop_every_n_frames == 0)

        def run_loop(ms):
            ms, _, _ = lm.loop_closure_step(ms, cfg)
            return ms

        mapping = jax.lax.cond(do_loop, run_loop, lambda m: m, mapping)

    T_map2laser = mapping.T_map2odom @ T_odom2laser
    new_state = SlamState(odo=odo, mapping=mapping, frame=state.frame + 1,
                          T_odom2laser=T_odom2laser, imu=state.imu)
    # base-link extrinsic: report poses in the base frame, exactly the
    # reference's tf_o2b = tf_o2l * tf_b2l_.inverse() (LO.cpp:591); identity
    # default folds away at trace time
    if any(cfg.tf_b2l):
        T_out = T_map2laser @ _tf_l2b(cfg, T_map2laser.dtype)
    else:
        T_out = T_map2laser
    return new_state, T_out


def _tf_l2b(cfg: PipelineConfig, dtype) -> jnp.ndarray:
    """inv(T_b2l) as a trace-time constant from cfg.tf_b2l =
    (x, y, z, roll, pitch, yaw) of the laser in base-link."""
    from ..ops import se3
    t = jnp.asarray(cfg.tf_b2l[:3], dtype)
    R = se3.rpy_to_rot(jnp.asarray(cfg.tf_b2l[3:], dtype))
    T = jnp.eye(4, dtype=dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    return se3.inv_mat(T)


def scan_sequence(state: SlamState, points_seq, mask_seq, times, cfg,
                  aligned_groups: bool = False):
    """lax.scan the full pipeline over a batch of frames (bench path).

    ``aligned_groups=True`` compiles the DECIMATION-ALIGNED program: the
    scan runs over groups of ``map_frame_decimation`` frames with the
    mapping gate burned in statically (slot 0 maps, the rest don't), so no
    ``lax.cond`` ever carries the keyframe store — measured 1.45 ms/frame
    cheaper at the full geometry (benchmarks/scan_variants.py).  ONLY valid
    when ``state.frame % map_frame_decimation == 0`` and the frame count
    divides evenly; callers with host-side frame knowledge (SlamPipeline.
    run_scanned, bench.py — frame 0 start, fixed chunks) assert that and
    pick this program, everything else keeps the phase-safe cond."""
    d = cfg.map_frame_decimation
    n = points_seq.shape[0]
    if not aligned_groups or d <= 1 or n % d != 0:
        def body(st, inp):
            p, m, t = inp
            st, pose = slam_step(st, p, m, t, cfg)
            return st, pose

        return jax.lax.scan(body, state, (points_seq, mask_seq, times))

    def body(st, inp):
        p, m, t = inp
        poses = []
        for i in range(d):
            st, pose = slam_step(st, p[i], m[i], t[i], cfg,
                                 do_map_static=(i == 0))
            poses.append(pose)
        return st, jnp.stack(poses)

    pts_g = points_seq.reshape((n // d, d) + points_seq.shape[1:])
    msk_g = mask_seq.reshape((n // d, d) + mask_seq.shape[1:])
    t_g = times.reshape(n // d, d)
    st, poses = jax.lax.scan(body, state, (pts_g, msk_g, t_g))
    return st, poses.reshape((n,) + poses.shape[2:])


class SlamPipeline:
    """Host driver around the jitted step (stands in for the launch files).

    Streaming performance (the robot / bag-replay path): the round-3 profile
    showed per-frame host<->device round-trips dominating wall time on a
    tunneled TPU (validation ran ~0.95 fps vs the 125 fps batch headline).
    Three fixes, all host-side:

    * state buffers are DONATED to the jitted step, so XLA updates them in
      place instead of allocating + copying the full keyframe store each
      frame;
    * IMU samples are buffered host-side and flushed as ONE chunked device
      call per scan (``ops/deskew.integrate_imu_chunk``) instead of one
      dispatch per 40 Hz message;
    * per-frame outputs stay on device (JAX async dispatch keeps a window of
      steps in flight); the only forced syncs are the capacity check every
      ``_sync_every`` frames — results materialise when the caller reads
      ``poses``.
    """

    _IMU_CHUNK = 64       # >= samples per scan at 40 Hz IMU / 5 Hz lidar
    _sync_every = 16

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32,
                 collect_odom_poses: bool = False):
        self.cfg = cfg
        self._dtype = dtype
        # debug-only: per-frame T_odom2laser collection forces a host sync
        # (the state leaf is donated next step, so it must be materialised
        # NOW) — off by default to keep the dispatch window full
        self._collect_odom = collect_odom_poses
        self._step = jax.jit(lambda st, p, m, t: slam_step(st, p, m, t, cfg),
                             donate_argnums=0)
        self._imu_step = jax.jit(deskew.integrate_imu)
        self._imu_flush = jax.jit(deskew.integrate_imu_chunk, donate_argnums=0)
        self._compact = jax.jit(lambda ms: lm.compact_keyframes(ms, cfg),
                                donate_argnums=0)
        self.state = init_state(cfg, dtype)
        self.poses = []
        self.odom_poses = []
        self._imu_pending = []
        self._frame = 0
        self._overflow_warned = False
        self.compactions = 0

    def _check_overflow(self):
        """Surface the explicit keyframe-capacity policy (pose_graph
        docstring): dropped keyframes are counted, never silent.  With
        :meth:`_maybe_compact` running on the ``process`` path this should
        never fire; it still guards the batch (`run_scanned`) path, where a
        single device call can cross capacity mid-scan."""
        if self._overflow_warned:
            return
        ov = int(self.state.mapping.graph.overflow)
        if ov:
            import warnings
            warnings.warn(
                f"pose-graph hit capacity ({self.cfg.max_keyframes}) inside "
                f"a batched scan: {ov} keyframes rejected before host-side "
                "compaction could run; use shorter run_scanned chunks or "
                "raise cfg.max_keyframes", RuntimeWarning)
            self._overflow_warned = True

    def _maybe_loop(self, frames_advanced: int):
        """Hoisted loop-closure attempt (cfg.loop_in_step=False): run the
        separately-compiled loop program when the frame counter crossed a
        ``loop_every_n_frames`` boundary — the reference's own 1 Hz loop
        THREAD (LM.cpp:779-794) rather than inline-in-step work.  The
        program is jitted lazily on the first eligible call, so a run that
        never revisits territory never pays the loop compile.

        A chunked dispatch can cross SEVERAL boundaries; exactly ONE
        attempt runs regardless, which is also the maximum USEFUL number:
        ``loop_closure_step`` gates on ``latest != last_loop_kf``, so a
        second attempt against the same graph tip is a guaranteed no-op
        (sub-chunk attempts would all see the same tip — the frames landed
        in one device call).  The real effect of chunking is cadence
        granularity (one attempt per ``chunk * scan_period`` seconds vs the
        reference's 1 s); measured equal accuracy on the validation circuit
        at the default --chunk 16 (benchmarks/validation_run.json)."""
        cfg = self.cfg
        if not cfg.loop_closure_enabled or cfg.loop_in_step:
            return
        lo_f = self._frame - frames_advanced
        if (self._frame // cfg.loop_every_n_frames
                == lo_f // cfg.loop_every_n_frames):
            return
        # the count>1 guard syncs the host; latch it so the async dispatch
        # window only pays that sync during the first seconds of a run
        if not getattr(self, "_loop_live", False):
            if int(self.state.mapping.graph.count) <= 1:
                return
            self._loop_live = True
        if not hasattr(self, "_loop_step"):
            self._loop_step = jax.jit(
                lambda ms: lm.loop_closure_step(ms, cfg)[0],
                donate_argnums=0)
        self.state = self.state._replace(
            mapping=self._loop_step(self.state.mapping))

    def _maybe_compact(self, margin: int = 16):
        """Keep-mapping-forever policy (LM.cpp:67-69,699-701 semantics):
        when the graph nears capacity, decimate old keyframes
        (lm.compact_keyframes) so new territory keeps mapping."""
        if int(self.state.mapping.graph.count) >= self.cfg.max_keyframes - margin:
            self.state = self.state._replace(
                mapping=self._compact(self.state.mapping))
            self.compactions += 1

    def reset(self):
        """Fresh SLAM state, keeping the compiled step/scan programs."""
        self.state = init_state(self.cfg, self._dtype)
        self.poses = []
        self.odom_poses = []
        self._imu_pending = []
        self._frame = 0
        self._overflow_warned = False
        self._loop_live = False
        self.compactions = 0

    def add_imu(self, t: float, rpy, lin_acc):
        """Feed one IMU sample (the /imu/data handler, LO.cpp:840-881).

        Samples queue host-side; the integration runs as one chunked device
        call per scan (see class docstring)."""
        self._imu_pending.append((float(t), np.asarray(rpy, np.float32),
                                  np.asarray(lin_acc, np.float32)))

    def _flush_imu(self):
        C = self._IMU_CHUNK
        while self._imu_pending:
            batch, self._imu_pending = (self._imu_pending[:C],
                                        self._imu_pending[C:])
            ts = np.full(C, 1e18, np.float32)
            rpys = np.zeros((C, 3), np.float32)
            accs = np.zeros((C, 3), np.float32)
            for i, (t, r, a) in enumerate(batch):
                ts[i], rpys[i], accs[i] = t, r, a
            buf = self._imu_flush(self.state.imu, jnp.asarray(ts),
                                  jnp.asarray(rpys), jnp.asarray(accs),
                                  jnp.int32(len(batch)))
            self.state = self.state._replace(imu=buf)

    def add_odom(self, t: float, rpy, pos, velo=(0.0, 0.0, 0.0)):
        """Feed one external-odometry sample (the ``use_odom`` input path,
        LO.cpp:737-795): pose comes from the message, not integrated."""
        if not hasattr(self, "_odom_step"):
            self._odom_step = jax.jit(deskew.integrate_odom)
        buf = self._odom_step(self.state.imu, jnp.float32(t),
                              jnp.asarray(rpy, jnp.float32),
                              jnp.asarray(pos, jnp.float32),
                              jnp.asarray(velo, jnp.float32))
        self.state = self.state._replace(imu=buf)

    def process(self, points: np.ndarray, mask: np.ndarray,
                time: Optional[float] = None):
        """Feed one scan; returns the map-frame pose [4, 4] (device array —
        dispatch is asynchronous; ``np.asarray`` it to force the value)."""
        if self._imu_pending:
            self._flush_imu()
        t = self._frame * self.cfg.scan_period if time is None else time
        self.state, pose = self._step(
            self.state, jnp.asarray(points), jnp.asarray(mask),
            jnp.asarray(t, jnp.float32))
        self._frame += 1
        self._maybe_loop(1)
        self.poses.append(pose)
        if self._collect_odom:
            self.odom_poses.append(np.asarray(self.state.T_odom2laser))
        if self._frame % self._sync_every == 0:
            # bounded in-flight window: the int() read inside the capacity
            # check forces one sync per window
            self._maybe_compact()
        if self._frame % 128 == 0:
            self._check_overflow()
        return pose

    def run(self, points_seq: np.ndarray, mask_seq: np.ndarray) -> np.ndarray:
        for k in range(points_seq.shape[0]):
            self.process(points_seq[k], mask_seq[k])
        return np.stack(self.poses)

    def run_scanned(self, points_seq: np.ndarray, mask_seq: np.ndarray,
                    times: Optional[np.ndarray] = None) -> np.ndarray:
        """Batch path: lax.scan over all frames in ONE device call.

        Preferred for throughput — the per-frame ``process`` path pays a
        host<->device round-trip per frame, which dominates on tunneled
        devices.  ``times``: real scan stamps (bag replay); defaults to the
        uniform frame clock.  Also the CHUNKED STREAMING path: the CLI
        feeds fixed-size windows of buffered scans through this (one
        dispatch per chunk, bounded latency = chunk x scan_period), which
        is what makes bag replay wall-clock viable on a tunneled device —
        jit specializes per chunk length, so fixed chunks compile once."""
        if self._imu_pending:
            self._flush_imu()
        n = points_seq.shape[0]
        if times is None:
            times = jnp.arange(self._frame, self._frame + n,
                               dtype=jnp.float32) * self.cfg.scan_period
        # decimation-aligned program when the host-known frame phase allows
        # (frame 0 start + chunks that are decimation multiples keep this
        # true for every dispatch) — 1.45 ms/frame cheaper, same math
        d = self.cfg.map_frame_decimation
        aligned = (self._frame % d == 0) and (n % d == 0)
        attr = "_scan_aligned" if aligned else "_scan"
        if not hasattr(self, attr):
            cfg = self.cfg
            setattr(self, attr, jax.jit(
                lambda st, p, m, t: scan_sequence(st, p, m, t, cfg,
                                                  aligned_groups=aligned),
                donate_argnums=0))
        self.state, est = getattr(self, attr)(
            self.state, jnp.asarray(points_seq), jnp.asarray(mask_seq),
            jnp.asarray(times, jnp.float32))
        est = np.asarray(est)
        self._frame += n
        self._maybe_loop(n)
        self.poses.extend(est)
        # a whole chunk can land between capacity checks: margin >= chunk
        self._maybe_compact(margin=max(16, n))
        self._check_overflow()
        return est

    # ---- /save_map equivalent (LM.cpp:1007-1055) ----
    def export_map(self):
        """Assemble the global map from keyframes; returns dict of arrays."""
        ms = self.state.mapping
        n = int(ms.graph.count)
        poses = np.asarray(ms.graph.poses)[:n]
        out = {"keyposes": poses}
        for name, pts, val in (
            ("corner", np.asarray(ms.kf_corner), np.asarray(ms.kf_corner_valid)),
            ("surf", np.asarray(ms.kf_surf), np.asarray(ms.kf_surf_valid)),
            ("outlier", np.asarray(ms.kf_outlier), np.asarray(ms.kf_outlier_valid)),
        ):
            clouds = []
            for k in range(n):
                p = pts[k][val[k]]
                clouds.append(p @ poses[k][:3, :3].T + poses[k][:3, 3])
            out[name] = (np.concatenate(clouds, 0) if clouds
                         else np.zeros((0, 3), np.float32))
        return out

    # ---- checkpoint/resume (new capability; reference has none) ----
    def _state_schema(self) -> str:
        """Structure fingerprint: treedef + per-leaf shape/dtype.  Leaves are
        stored positionally, so ANY state-structure change (a new field, a
        capacity change) silently misassigns arrays without this check."""
        flat, treedef = jax.tree_util.tree_flatten(self.state)
        leaves = ";".join(f"{tuple(x.shape)}:{x.dtype}" for x in flat)
        return f"{treedef}|{leaves}"

    def save_checkpoint(self, path: str):
        flat, treedef = jax.tree_util.tree_flatten(self.state)
        np.savez(path, *[np.asarray(x) for x in flat],
                 frame=self._frame,
                 schema=np.asarray(self._state_schema()))

    def load_checkpoint(self, path: str):
        data = np.load(path)
        if "schema" in data.files:
            saved = str(data["schema"])
            if saved != self._state_schema():
                raise ValueError(
                    f"checkpoint {path} was written by an incompatible "
                    "pipeline state layout (different code version or "
                    "config capacities); re-run from the source data")
        flat, treedef = jax.tree_util.tree_flatten(self.state)
        arrays = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
        self.state = jax.tree_util.tree_unflatten(treedef, arrays)
        self._frame = int(data["frame"])
