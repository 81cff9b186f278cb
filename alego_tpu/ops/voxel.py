"""Deterministic voxel-grid centroid downsampling (pcl::VoxelGrid equivalent).

The reference leans on ``pcl::VoxelGrid`` with leaf sizes 0.4/0.8/1.0
(``/root/reference/src/LO.cpp:360-363``, ``LM.cpp:171-175``).  TPU-native
design notes, all measured on v5e: random gathers are the slowest primitive
(~15 ns/elt; an argsort+gather formulation ran ~9 ms at 153k), row-serial
scatters are nearly as bad (the original ``at[run].add`` segment-sum cost
3.17 ms at 153k, 8x its own sort), while SORTS with payload operands are
cheap (0.4 ms at 153k x 5 operands).  So the downsample is sort + two-float
prefix sums + a second compaction sort — fully scatter- and gather-free
(see voxel_downsample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_key(points: jnp.ndarray, leaf: float, extent: float) -> jnp.ndarray:
    """Pack floor(p/leaf) into a single non-negative int32 key < 2^30.

    ``extent`` bounds |coordinate|; cells outside clamp to the border.  The
    packed index is bit-mixed (splitmix-style) so that when a fixed output
    capacity overflows, dropped voxels scatter uniformly across space instead
    of truncating one contiguous region.
    """
    side = int(2 * extent / leaf) + 2
    assert side ** 3 < 2 ** 31, "voxel grid too fine for int32 keys"
    q = jnp.clip(jnp.floor(points / leaf).astype(jnp.int32) + side // 2, 0, side - 1)
    key = (q[..., 0] * side + q[..., 1]) * side + q[..., 2]
    u = key.astype(jnp.uint32)
    u = (u ^ (u >> 16)) * jnp.uint32(0x45D9F3B)
    u = (u ^ (u >> 16)) * jnp.uint32(0x45D9F3B)
    u = u ^ (u >> 16)
    # >>2 keeps keys < 2^30, strictly below the sentinel. (Dropping two mix
    # bits can alias distinct cells with ~1e-8 probability per pair.)
    return (u >> 2).astype(jnp.int32)


_SENTINEL = jnp.int32(2 ** 30)


def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     cap: int, extent: float = 256.0,
                     aux: jnp.ndarray | None = None):
    """Centroid-downsample a masked point set into ``cap`` output slots.

    Returns (points [cap, 3], mask [cap]) or, with ``aux`` [N, A] given,
    (points, mask, aux_mean [cap, A]) — aux channels are averaged per voxel
    (the reference carries ring ids in ``intensity``).

    SCATTER-FREE: the previous formulation segment-summed runs with
    ``at[run].add`` — TPU scatter runs row-serial (~20 ns/row) and was 8x
    the cost of the sort itself (3.17 ms vs 0.39 ms at 153k rows).  Here
    run sums come from CUMSUM DIFFERENCES: sort by key, prefix-sum the
    coordinates, compact each run's LAST row with a second stable sort, and
    difference adjacent compacted rows.  The running totals reach ~1e7
    where plain-f32 differencing would lose ~1 m, so the prefix sums are
    COMPENSATED (hi, lo) two-float pairs built with an associative TwoSum
    scan — pure elementwise f32.  (Both f64 routes died on this TPU
    toolchain: an f64-payload lax.sort never finished compiling, and an f64
    cumsum SIGSEGV'd the compiler.)  The run sum is then
    (hi_end - hi_prev) + (lo_end - lo_prev): the hi difference of nearby
    f32 values is exact, the lo terms carry what rounding lost.  Output
    slot order (ascending hashed key, overflow runs dropped) matches the
    scatter version exactly.
    """
    dtype = points.dtype
    keys = jnp.where(mask, voxel_key(points, leaf, extent), _SENTINEL)
    ops = [keys, points[:, 0], points[:, 1], points[:, 2]]
    n_aux = 0
    if aux is not None:
        if aux.ndim == 1:
            aux = aux[:, None]
        n_aux = aux.shape[1]
        ops += [aux[:, i].astype(dtype) for i in range(n_aux)]

    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1)
    ks = sorted_ops[0]
    alive = ks < _SENTINEL

    def _two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    def _combine(ca, cb):
        hi, e = _two_sum(ca[0], cb[0])
        return hi, ca[1] + cb[1] + e

    # blocked prefix sums: an associative TwoSum scan over all N rows was
    # numerically ideal but its log2(N) unrolled levels compiled for minutes
    # on TPU; instead each 512-row block cumsums locally in f32 and only the
    # ~N/512 block offsets go through the TwoSum scan (trivial compile).
    # Row prefix = (offset_hi, offset_lo + local).  Error bound: the raw
    # local prefix rides in the LOW word (magnitude <= 512*extent = 1.3e5 at
    # extent 256), so per-run differencing can lose up to ~ulp(1.3e5) ~
    # 1.6 cm worst case — not the ~2 mm a pure block-rounding argument gives.
    # In practice runs are short and local prefixes small; measured error
    # stays ~1e-3 of leaf and well under every gating threshold
    # (tests/test_solvers.py voxel cases).
    BLK = 512
    N = ks.shape[0]
    padN = (-N) % BLK

    def csum2(c):
        x = jnp.where(alive, c, 0).astype(jnp.float32)
        if padN:
            x = jnp.concatenate([x, jnp.zeros((padN,), jnp.float32)])
        xb = x.reshape(-1, BLK)
        local = jnp.cumsum(xb, axis=1)
        tot = local[:, -1]
        off_hi, off_lo = jax.lax.associative_scan(
            _combine, (tot, jnp.zeros_like(tot)))
        # exclusive offsets: shift by one block
        off_hi = jnp.concatenate([jnp.zeros((1,)), off_hi[:-1]])
        off_lo = jnp.concatenate([jnp.zeros((1,)), off_lo[:-1]])
        hi = jnp.broadcast_to(off_hi[:, None], local.shape).reshape(-1)
        lo = (off_lo[:, None] + local).reshape(-1)
        return hi[:N], lo[:N]

    csum = []
    for c in [alive] + list(sorted_ops[1:]):
        hi, lo = csum2(c)
        csum += [hi, lo]                              # cnt, x, y, z[, aux]
    is_last = alive & jnp.concatenate(
        [ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    # UNIQUE compaction key (position-encoded) so the sort need not be
    # stable: a flat `is_stable=True` lax.sort at this size compiles for
    # MINUTES on this TPU toolchain (145 s measured for a plain stable
    # 5-operand sort at 153k; non-stable compiles in seconds)
    idx = jnp.arange(ks.shape[0], dtype=jnp.int32)
    key2 = jnp.where(is_last, idx, ks.shape[0] + idx)
    packed = jax.lax.sort(tuple([key2] + csum), num_keys=1)
    if packed[1].shape[0] < cap:     # fewer rows than output slots: pad
        pad_out = cap - packed[1].shape[0]
        packed = tuple(
            jnp.concatenate([p, jnp.zeros((pad_out,), p.dtype)])
            for p in packed)
    z1 = jnp.zeros((1,), jnp.float32)
    seg = []
    for i in range(1, len(packed), 2):
        Lhi, Llo = packed[i][:cap], packed[i + 1][:cap]
        Phi = jnp.concatenate([z1, Lhi[:-1]])
        Plo = jnp.concatenate([z1, Llo[:-1]])
        seg.append((Lhi - Phi) + (Llo - Plo))
    n_runs = jnp.sum(is_last.astype(jnp.int32))
    slot_ok = jnp.arange(cap) < jnp.minimum(n_runs, cap)
    cnts = seg[0]
    out_mask = slot_ok & (cnts > 0.5)
    denom = jnp.maximum(jnp.round(cnts), 1.0)
    out_pts = jnp.where(out_mask[:, None],
                        (jnp.stack(seg[1:4], -1) / denom[:, None])
                        .astype(dtype), 0.0)
    if aux is None:
        return out_pts, out_mask
    a_mean = (jnp.stack(seg[4:], -1) / denom[:, None]).astype(dtype)
    return out_pts, out_mask, jnp.where(out_mask[:, None], a_mean, 0.0)


# Same algorithm — kept as an alias so call sites can express intent.
voxel_downsample_exact = voxel_downsample


def compact_masked(points: jnp.ndarray, mask: jnp.ndarray, cap: int,
                   aux: jnp.ndarray | None = None):
    """Stable front-compaction of a masked set into ``cap`` slots
    (gather-free: payloads ride the sort).  Stability comes from a UNIQUE
    position-encoded key with a non-stable sort — `is_stable=True` on flat
    sorts this size compiles for minutes on this TPU toolchain."""
    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, idx, n + idx)
    ops = [key, points[:, 0], points[:, 1], points[:, 2],
           mask.astype(points.dtype)]
    aux_was_1d = False
    n_aux = 0
    if aux is not None:
        if aux.ndim == 1:
            aux = aux[:, None]
            aux_was_1d = True
        n_aux = aux.shape[1]
        ops += [aux[:, i].astype(points.dtype) for i in range(n_aux)]
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1)
    _, xs, ys, zs, ms = sorted_ops[:5]
    out_mask = (ms > 0)[:cap]
    out_pts = jnp.where(out_mask[:, None],
                        jnp.stack([xs, ys, zs], -1)[:cap], 0.0)
    if aux is None:
        return out_pts, out_mask
    a_s = jnp.stack(sorted_ops[5:], -1)[:cap]
    a_s = jnp.where(out_mask[:, None], a_s, 0.0)
    a_s = a_s.astype(aux.dtype)  # small ints survive the f32 ride exactly
    if aux_was_1d:
        a_s = a_s[:, 0]
    return out_pts, out_mask, a_s


def merge_masked(list_pts, list_masks, cap: int):
    """Concatenate masked sets then front-compact to ``cap``."""
    pts = jnp.concatenate(list_pts, 0)
    mask = jnp.concatenate(list_masks, 0)
    return compact_masked(pts, mask, cap)
