"""Multi-device scale-out (SURVEY §2.3/§5.7-5.8 — all new design).

The reference's only concurrency is 3 ROS processes on one host.  The
TPU-native scaling story replaces it with SPMD over a ``jax.sharding.Mesh``:

* **Frame-parallel front end** (``data`` axis): projection, segmentation and
  feature extraction are frame-independent, so a batch of raw scans is
  sharded across devices and each chip runs the full stage-1/2 front half on
  its shard — pure SPMD, no collectives.
* **Factor-parallel pose graph** (``data`` axis reused): between/loop factors
  are sharded; every device assembles the normal-equation contribution of its
  factor shard, ``psum`` over ICI reduces H and b, and the (small) solve runs
  replicated.  This is the Schur-free direct analogue of the distributed
  pose-graph design in BASELINE.json; keyframe *storage* can ride the same
  sharding.

Both are exercised on a virtual CPU mesh in tests and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..config import PipelineConfig
from ..models.image_projection import image_projection
from ..ops.features import extract_features
from ..ops import se3
from ..models import pose_graph as pg


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# Frame-parallel front end
# ---------------------------------------------------------------------------

def make_sharded_frontend(cfg: PipelineConfig, mesh: Mesh, axis: str = "data"):
    """Returns jitted fn: (points [B, N, 3], mask [B, N]) -> FeatureClouds
    batched over B, with B sharded across the mesh."""

    def frontend_one(pts, mask):
        seg = image_projection(pts, mask, cfg)
        return extract_features(seg, cfg)

    batched = jax.vmap(frontend_one)
    sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(points, mask):
        points = jax.lax.with_sharding_constraint(points, sharding)
        mask = jax.lax.with_sharding_constraint(mask, sharding)
        return batched(points, mask)

    return run


# ---------------------------------------------------------------------------
# Factor-parallel distributed pose-graph solve
# ---------------------------------------------------------------------------

def _local_chain_contrib(poses, chain_rel, w, info, shard_offset, N):
    """H, b contributions of a shard of chain factors (i-1 -> i)."""
    dtype = poses.dtype
    S = chain_rel.shape[0]
    j_global = shard_offset + jnp.arange(S, dtype=jnp.int32)
    i_global = jnp.maximum(j_global - 1, 0)
    Xi = poses[i_global]
    Xj = poses[j_global]
    r, Ji, Jj = pg._between_residual(Xi, Xj, chain_rel)

    H = jnp.zeros((N, N, 6, 6), dtype)
    b = jnp.zeros((N, 6), dtype)
    WJi = Ji * (w[:, None, None] * info[None, :, None])
    WJj = Jj * (w[:, None, None] * info[None, :, None])
    H = H.at[i_global, i_global].add(jnp.einsum("nki,nkj->nij", Ji, WJi))
    H = H.at[j_global, j_global].add(jnp.einsum("nki,nkj->nij", Jj, WJj))
    H = H.at[i_global, j_global].add(jnp.einsum("nki,nkj->nij", Ji, WJj))
    H = H.at[j_global, i_global].add(jnp.einsum("nki,nkj->nij", Jj, WJi))
    b = b.at[i_global].add(jnp.einsum("nki,nk->ni", WJi, r))
    b = b.at[j_global].add(jnp.einsum("nki,nk->ni", WJj, r))
    return H, b


def make_distributed_pose_graph_solver(mesh: Mesh, max_kf: int,
                                       chain_sigma, iters: int = 5,
                                       axis: str = "data",
                                       damping: float = 1e-6):
    """Distributed GN: chain factors sharded over the mesh, H/b psum-reduced.

    Returns jitted fn (poses [N,4,4] replicated, chain_rel [N,4,4] sharded on
    axis 0, active [N] replicated) -> optimized poses [N,4,4] (replicated).
    """
    n_dev = mesh.shape[axis]
    assert max_kf % n_dev == 0, "max_kf must divide the mesh"
    shard = max_kf // n_dev
    info = 1.0 / jnp.asarray(chain_sigma, jnp.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P()),
             out_specs=P())
    def solve(poses, chain_rel_shard, active):
        my = jax.lax.axis_index(axis)
        offset = my * shard
        dtype = poses.dtype

        def gn_iter(_, poses):
            idx = offset + jnp.arange(shard, dtype=jnp.int32)
            w = (active[idx] & (idx > 0)).astype(dtype)
            H_loc, b_loc = _local_chain_contrib(
                poses, chain_rel_shard, w, info.astype(dtype), offset, max_kf)
            H = jax.lax.psum(H_loc, axis)
            b = jax.lax.psum(b_loc, axis)

            # prior on node 0 (replicated computation)
            r_p = se3.se3_log(se3.inv_mat(chain_rel_shard[0]) @ poses[0])
            r_p = jax.lax.psum(jnp.where(my == 0, r_p, 0.0), axis)
            H = H.at[0, 0].add(jnp.diag(info.astype(dtype)))
            b = b.at[0].add(info.astype(dtype) * r_p)

            act = jnp.repeat(active.astype(dtype), 6)
            Hd = H.transpose(0, 2, 1, 3).reshape(max_kf * 6, max_kf * 6)
            Hd = Hd * (act[:, None] * act[None, :]) + jnp.diag(1.0 - act)
            Hd = Hd + damping * jnp.eye(max_kf * 6, dtype=dtype)
            delta = -jnp.linalg.solve(Hd, b.reshape(-1) * act).reshape(max_kf, 6)
            upd = poses @ se3.se3_exp(delta)
            return jnp.where(active[:, None, None], upd, poses)

        return jax.lax.fori_loop(0, iters, gn_iter, poses)

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# Combined multi-chip "training step" for the dry run
# ---------------------------------------------------------------------------

def make_multichip_step(cfg: PipelineConfig, mesh: Mesh, max_kf: int,
                        axis: str = "data"):
    """One combined step: sharded front end over a frame batch + distributed
    pose-graph GN — the full multi-device dataflow in a single jit."""
    frontend = make_sharded_frontend(cfg, mesh, axis)
    solver = make_distributed_pose_graph_solver(
        mesh, max_kf, cfg.pose_graph_chain_sigma, iters=2, axis=axis)

    def step(points, mask, poses, chain_rel, active):
        fc = frontend(points, mask)
        new_poses = solver(poses, chain_rel, active)
        return fc, new_poses

    return step
