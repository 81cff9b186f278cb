"""ONE map, ONE graph, D devices: the distributed single-map mapping path.

Round 2's mesh mode ran B *independent* SLAM sequences; this module closes
SURVEY §7 phase 7's actual ask — a mapping step whose LOCAL MAP SEARCH is
spatially sharded across the mesh (parallel/map_shard: each device owns 1/D
of the map rows and answers 5-NN against its shard, candidates + COORDS
merged with O(D*Q*k) traffic) and whose loop-closure pose-graph solve is the
distributed Schur solver (parallel/schur) instead of the single-device
factored solve.

The keyframe CLOUD store and the (small) GN solve remain replicated: the
association distance matrices are the compute that scales with map size
(SURVEY §6 mapping breakdown), and the per-device share drops 1/D here.

Correctness contract (asserted in dryrun_multichip and tests): identical
results to models/laser_mapping.mapping_step / loop_closure_step up to
collective reduction order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..config import PipelineConfig
from ..models import laser_mapping as lm
from ..models import pose_graph as pg
from .map_shard import make_sharded_map_knn
from .schur import make_schur_solver


def make_sharded_mapping_step(cfg: PipelineConfig, mesh: Mesh,
                              axis: str = "data"):
    """Returns jitted fn with the mapping_step signature (minus cfg): the
    5-NN map association runs sharded over ``mesh``.

    Map capacities must divide the mesh size (the defaults are powers of
    two).  Inputs may be replicated; jit inserts the scatter to shards on
    entry and the candidate merge is the only gather.
    """
    D = mesh.shape[axis]
    assert cfg.map_corner_cap % D == 0 and cfg.map_surf_cap % D == 0, (
        "map caps must divide the mesh size")
    knn_fn = make_sharded_map_knn(mesh, cfg.map_knn, axis=axis,
                                  chunk=cfg.knn_chunk, return_coords=True)
    shard = NamedSharding(mesh, P(axis))

    def assoc(sel, ok, mpts, mok):
        mpts = jax.lax.with_sharding_constraint(mpts, shard)
        mok = jax.lax.with_sharding_constraint(mok, shard)
        d, _, coords = knn_fn(sel, ok, mpts, mok)
        return d, coords

    @jax.jit
    def step(ms, T_odom2laser, corner_pts, corner_valid, surf_pts,
             surf_valid, outlier_pts, outlier_valid, time):
        return lm.mapping_step(ms, T_odom2laser, corner_pts, corner_valid,
                               surf_pts, surf_valid, outlier_pts,
                               outlier_valid, time, cfg, assoc=assoc)

    return step


def make_sharded_loop_closure_step(cfg: PipelineConfig, mesh: Mesh,
                                   axis: str = "data"):
    """loop_closure_step with the pose-graph solve distributed over the
    mesh (parallel/schur — per-device factor assembly on sharded pose rows,
    separator-sized collectives)."""
    solver = make_schur_solver(mesh, cfg.max_keyframes, cfg.max_loop_factors,
                               cfg.pose_graph_chain_sigma,
                               iters=cfg.pose_graph_gn_iters, axis=axis)

    @jax.jit
    def step(ms):
        return lm.loop_closure_step(ms, cfg, graph_optimizer=solver)

    return step
