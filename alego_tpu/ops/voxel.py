"""Deterministic voxel-grid centroid downsampling (pcl::VoxelGrid equivalent).

The reference leans on ``pcl::VoxelGrid`` with leaf sizes 0.4/0.8/1.0
(``/root/reference/src/LO.cpp:360-363``, ``LM.cpp:171-175``).  TPU-native
re-design: quantise to a bounded int32 grid, sort the keys (masked points sink
to the end), mark unique-run starts, scatter-mean each run into a fixed-
capacity output with a validity mask.  One sort + a few scatters — no hash
maps, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_key(points: jnp.ndarray, leaf: float, extent: float) -> jnp.ndarray:
    """Pack floor(p/leaf) into a single non-negative int32 key.

    ``extent`` bounds |coordinate|; cells outside are clamped (they still
    downsample, just into border cells).  Grid side must satisfy side^3 < 2^31.
    """
    side = int(2 * extent / leaf) + 2
    assert side ** 3 < 2 ** 31, "voxel grid too fine for int32 keys"
    q = jnp.clip(jnp.floor(points / leaf).astype(jnp.int32) + side // 2, 0, side - 1)
    key = (q[..., 0] * side + q[..., 1]) * side + q[..., 2]
    # Bijective bit-mix (splitmix-style): equal cells stay equal, distinct
    # cells stay distinct, but sort order becomes spatially uniform — so when
    # the fixed output capacity overflows, dropped voxels are scattered across
    # the map instead of truncating one contiguous spatial region.
    u = key.astype(jnp.uint32)
    u = (u ^ (u >> 16)) * jnp.uint32(0x45d9f3b)
    u = (u ^ (u >> 16)) * jnp.uint32(0x45d9f3b)
    u = u ^ (u >> 16)
    return (u >> 1).astype(jnp.int32)  # keep below int32 max sentinel


def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     cap: int, extent: float = 256.0,
                     aux: jnp.ndarray | None = None):
    """Centroid-downsample a masked point set into ``cap`` output slots.

    Returns (points [cap, 3], mask [cap]) or, with ``aux`` [N, A] given,
    (points, mask, aux_mean [cap, A]) — aux channels are averaged per voxel
    (used to carry ring ids through the filter; the reference keeps them in
    ``intensity``).
    """
    n = points.shape[0]
    keys = jnp.where(mask, voxel_key(points, leaf, extent), jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pts_s = points[order]
    mask_s = mask[order]

    first = jnp.concatenate([jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]]) & mask_s
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1          # run index per element
    slot = jnp.where(mask_s, jnp.minimum(slot, cap - 1), cap)  # overflow -> dropped

    sums = jnp.zeros((cap + 1, 3), points.dtype).at[slot].add(
        jnp.where(mask_s[:, None], pts_s, 0.0))
    cnts = jnp.zeros((cap + 1,), jnp.int32).at[slot].add(mask_s.astype(jnp.int32))
    out_mask = cnts[:cap] > 0
    out_pts = sums[:cap] / jnp.maximum(cnts[:cap, None], 1)

    if aux is None:
        return jnp.where(out_mask[:, None], out_pts, 0.0), out_mask
    aux_s = aux[order]
    aux_sum = jnp.zeros((cap + 1, aux.shape[-1]), aux_s.dtype).at[slot].add(
        jnp.where(mask_s[:, None], aux_s, 0))
    aux_mean = aux_sum[:cap] / jnp.maximum(cnts[:cap, None], 1)
    return jnp.where(out_mask[:, None], out_pts, 0.0), out_mask, aux_mean


def compact_masked(points: jnp.ndarray, mask: jnp.ndarray, cap: int,
                   aux: jnp.ndarray | None = None):
    """Stable front-compaction of a masked set into ``cap`` slots."""
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)[:cap]
    out_mask = mask[order]
    out_pts = jnp.where(out_mask[:, None], points[order], 0.0)
    if aux is None:
        return out_pts, out_mask
    out_aux = jnp.where(out_mask[:, None] if aux.ndim == 2 else out_mask,
                        aux[order], 0)
    return out_pts, out_mask, out_aux


def merge_masked(list_pts, list_masks, cap: int):
    """Concatenate masked sets then front-compact to ``cap``."""
    pts = jnp.concatenate(list_pts, 0)
    mask = jnp.concatenate(list_masks, 0)
    return compact_masked(pts, mask, cap)
