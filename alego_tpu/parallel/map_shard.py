"""Spatially-sharded map KNN — per-device map memory O(N/D) (SURVEY §5.7).

The reference keeps every keyframe cloud on one host and rebuilds one
KD-tree per frame (LM.cpp:361-388,520,568); its map memory and search cost
grow with the whole environment.  Here the map point store is ROW-SHARDED
across the mesh: each device owns 1/D of the map points, answers the 5-NN
query against only its shard (the same fused kernel the single-chip path
uses), and a k-candidate merge runs on the gathered [D, Q, k] tops —
the collective is O(D*Q*k), independent of map size N.

This is the keyframe/map-block spatial partitioning called for by
SURVEY §7 phase 7: the map can grow D times larger at the same per-device
HBM, and the distance-matrix work scales down 1/D per chip.

Validated against the single-device ``ops.knn.knn`` on an 8-device virtual
mesh (tests/test_map_shard.py) and exercised by ``dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..ops.knn import knn_best


def make_sharded_map_knn(mesh: Mesh, k: int, axis: str = "data",
                         chunk: int = 4096, return_coords: bool = False):
    """Returns jitted fn: (query [Q, 3], qmask [Q], map_pts [N, 3],
    map_ok [N]) -> (d2 [Q, k] ascending, idx [Q, k] GLOBAL row indices),
    with map_pts/map_ok sharded over ``axis`` (N divisible by mesh size)
    and query replicated.

    ``return_coords=True`` additionally returns the neighbour COORDINATES
    [Q, k, 3]: each device gathers candidates from its own shard before the
    merge, so the consumer needs no global-row gather against the sharded
    store (the line/plane fits read coordinates, never indices) — traffic
    stays O(D*Q*k)."""
    D = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis), P(axis)),
             out_specs=((P(), P(), P()) if return_coords else (P(), P())),
             check_vma=False)
    def _knn(query, qmask, mp, mok):
        # local top-k on this device's map shard (global row offset applied)
        d_loc, i_loc = knn_best(query, qmask, mp, mok, k, chunk=chunk)
        base = jax.lax.axis_index(axis) * mp.shape[0]
        if return_coords:
            c_loc = mp[i_loc]                            # local-shard gather
        i_loc = i_loc + base
        # O(D*Q*k) candidate exchange — never the map itself
        d_all = jax.lax.all_gather(d_loc, axis)          # [D, Q, k]
        i_all = jax.lax.all_gather(i_loc, axis)
        Q = query.shape[0]
        d_cat = jnp.transpose(d_all, (1, 0, 2)).reshape(Q, D * k)
        i_cat = jnp.transpose(i_all, (1, 0, 2)).reshape(Q, D * k)
        neg, pos = jax.lax.top_k(-d_cat, k)
        d_best = -neg
        i_best = jnp.take_along_axis(i_cat, pos, axis=1)
        if not return_coords:
            return d_best, i_best
        c_all = jax.lax.all_gather(c_loc, axis)          # [D, Q, k, 3]
        c_cat = jnp.transpose(c_all, (1, 0, 2, 3)).reshape(Q, D * k, 3)
        c_best = jnp.take_along_axis(c_cat, pos[..., None], axis=1)
        return d_best, i_best, c_best

    return jax.jit(_knn)


def shard_map_points(mesh: Mesh, pts, ok, axis: str = "data"):
    """Place a [N, ...] map array row-sharded on the mesh (N padded to a
    multiple of the mesh size with invalid rows)."""
    D = mesh.shape[axis]
    N = pts.shape[0]
    pad = (-N) % D
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.zeros((pad,) + pts.shape[1:], pts.dtype)], 0)
        ok = jnp.concatenate([ok, jnp.zeros((pad,), bool)], 0)
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(pts, sh), jax.device_put(ok, sh)


def per_device_map_bytes(n_points: int, n_devices: int) -> int:
    """Map-store bytes per device: [N/D, 3] f32 + [N/D] bool."""
    rows = -(-n_points // n_devices)
    return rows * (3 * 4 + 1)
