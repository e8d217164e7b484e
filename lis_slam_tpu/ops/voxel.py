"""Fixed-capacity voxel-grid downsampling (scatter/segment based, no PCL).

Replaces pcl::VoxelGrid uses throughout the reference (odometry map
downsampling odomEstimationNode.cpp:195-205, per-class keyframe downsampling
subMapOptmizationNode.cpp:807-821, SubMapManager::voxel_downsample
subMap.h:1161-1249) with a sort-by-voxel + segment-mean pass over padded
buffers. Output is a fixed-capacity padded buffer: if the scene has more
occupied voxels than `capacity`, a hash-ordered subset is kept (callers size
capacity so this doesn't happen in practice; the count output lets tests
detect overflow).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# numpy scalar, NOT jnp: a module-level jnp scalar is a device buffer
# created on import; closed over in jitted fns it becomes a LIFTED
# executable parameter, and the runtime arg-passing fast path can
# disagree with the lifting decision ("supplied 2 buffers but compiled
# program expected 4", see tests/test_knn_voxel.py cache-collision
# regression). numpy scalars inline as literals at trace time.
_SENTINEL = np.uint32(0xFFFFFFFF)

# Exact packed voxel key, collision-free within a 4096 x 4096 x 255 cell
# window around the cloud's own min corner (e.g. 819 m x 819 m x 51 m at a
# 0.2 m leaf) — far larger than any single downsample call's extent in this
# system (sliding local maps are bbox-cropped to +-70 m, subMap.h:1125-1156).
# Out-of-window stragglers clamp to the boundary cell.


def _voxel_key(points: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> jnp.ndarray:
    c = jnp.floor(points / leaf).astype(jnp.int32)
    cmin = jnp.min(jnp.where(mask[:, None], c, jnp.int32(2**30)), axis=0)
    d = jnp.clip(c - cmin, 0, jnp.asarray([4095, 4095, 254], jnp.int32))
    key = (
        d[:, 0].astype(jnp.uint32)
        | (d[:, 1].astype(jnp.uint32) << 12)
        | (d[:, 2].astype(jnp.uint32) << 24)
    )
    return key


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd position (morton interleave helper)."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _voxel_key_morton(points: jnp.ndarray, mask: jnp.ndarray,
                      leaf: float) -> jnp.ndarray:
    """Morton (Z-order) voxel key, 10 bits/axis relative to the cloud's min
    corner — unique within a 1024^3-cell window AND spatially coherent, so
    buffers sorted by it feed the Pallas kNN kernel's tile-skipping bounds
    directly (see ops/pallas_knn.py)."""
    c = jnp.floor(points / leaf).astype(jnp.int32)
    cmin = jnp.min(jnp.where(mask[:, None], c, jnp.int32(2**30)), axis=0)
    d = jnp.clip(c - cmin, 0, 1023).astype(jnp.uint32)
    return (
        _spread3(d[:, 0]) | (_spread3(d[:, 1]) << 1) | (_spread3(d[:, 2]) << 2)
    )


def morton_sort_points(points: jnp.ndarray, mask: jnp.ndarray,
                       quant: float = 1.0):
    """Sort a padded cloud spatially (invalid rows go last). Returns
    (points, mask) reordered; used to make query blocks coherent for the
    Pallas kNN kernel."""
    key = jnp.where(mask, _voxel_key_morton(points, mask, quant), _SENTINEL)
    out = jax.lax.sort(
        (key, points[:, 0], points[:, 1], points[:, 2],
         mask.astype(jnp.float32)),
        num_keys=1,
    )
    pts = jnp.stack(out[1:4], axis=1)
    return pts, out[4] > 0.5


@functools.partial(jax.jit, static_argnames=("leaf", "capacity", "centroid"))
def voxel_downsample(
    points: jnp.ndarray,  # (N, 3) padded
    mask: jnp.ndarray,  # (N,) bool
    leaf: float,
    capacity: int,
    centroid: bool = False,
    payloads: tuple = (),
) -> tuple:
    """One point per voxel. Returns (points (C,3), mask (C,), count
    [, payloads (C,) x len(payloads)]).

    Default keeps the first point of each voxel (sort+gather only — TPU
    scatter-adds cost ~10x more than sorts, so the centroid average the
    PCL VoxelGrid computes is opt-in via centroid=True). First-point-per-
    voxel is the standard accelerator variant (e.g. KISS-ICP) and changes
    representative positions by at most leaf/2.

    `payloads`: optional per-point float columns that ride the sorting
    networks and come out aligned with the representative points (e.g. the
    per-point semantic weight of the matched clouds). Not supported with
    centroid=True.
    """
    h = jnp.where(mask, _voxel_key(points, mask, leaf), _SENTINEL)
    n = points.shape[0]
    if centroid:
        assert not payloads
        order = jnp.argsort(h)
        hs = h[order]
        ps = points[order]
        ms = mask[order]
        is_new = jnp.concatenate(
            [jnp.ones(1, bool), hs[1:] != hs[:-1]]) & ms
        seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        dest = jnp.where(ms & (seg < capacity) & (seg >= 0), seg, capacity)
        sums = jnp.zeros((capacity + 1, 3), points.dtype).at[dest].add(ps)
        cnts = jnp.zeros((capacity + 1,), jnp.int32).at[dest].add(1)
        out = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1)
        out_mask = cnts[:capacity] > 0
        n_vox = jnp.minimum(jnp.sum(is_new.astype(jnp.int32)), capacity)
        return out, out_mask, n_vox
    # payload rides INSIDE the sorting network (multi-operand lax.sort):
    # argsort + random gathers cost 3-6 ms per 100k rows on this TPU (same
    # optimization as voxel_merge_aged). The iota second key keeps the
    # first-in-input-order point per voxel (stability). Compaction to the
    # front is rank arithmetic + ONE unique-monotonic-index scatter instead
    # of a second sort (the same rewrite that won in ops/projection.py:
    # dest is non-decreasing over sorted positions, so the scatter is a
    # cheap streaming write, not random access) — this is the hot op of the
    # full_ds/hybrid accuracy matching mode (65k surf cloud per scan).
    iota = jnp.arange(n, dtype=jnp.int32)
    s = jax.lax.sort(
        (h, iota, points[:, 0], points[:, 1], points[:, 2]) + tuple(payloads),
        num_keys=2)
    hs = s[0]
    is_new = jnp.concatenate([jnp.ones(1, bool), hs[1:] != hs[:-1]])
    is_new = is_new & (hs != _SENTINEL)
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    dest = jnp.where(is_new & (seg < capacity), seg, capacity)
    k = jnp.minimum(jnp.sum(is_new.astype(jnp.int32)), capacity)
    out_mask = jnp.arange(capacity) < k
    cols = jnp.stack(s[2:], axis=1)  # (n, 3 + n_payloads)
    buf = jnp.zeros((capacity + 1, cols.shape[1]), cols.dtype)
    buf = buf.at[dest].set(cols)[:capacity]
    out = jnp.where(out_mask[:, None], buf[:, :3], 0.0)
    if payloads:
        out_pay = tuple(jnp.where(out_mask, buf[:, 3 + i], 0.0)
                        for i in range(len(payloads)))
        return (out, out_mask, k) + out_pay
    return out, out_mask, k


@functools.partial(jax.jit, static_argnames=("leaf", "capacity"))
def voxel_downsample_labeled(
    points: jnp.ndarray,  # (N, 3)
    labels: jnp.ndarray,  # (N,) int32
    mask: jnp.ndarray,
    leaf: float,
    capacity: int,
):
    """Centroid downsample carrying a representative (max) label per voxel.
    Matches the per-class use in the reference where clouds are already
    split by class before filtering (labels homogeneous per call)."""
    h = jnp.where(mask, _voxel_key(points, mask, leaf), _SENTINEL)
    order = jnp.argsort(h)
    hs = h[order]
    ps = points[order]
    ls = labels[order]
    ms = mask[order]
    is_new = jnp.concatenate([jnp.ones(1, bool), hs[1:] != hs[:-1]]) & ms
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    dest = jnp.where(ms & (seg < capacity) & (seg >= 0), seg, capacity)
    sums = jnp.zeros((capacity + 1, 3), points.dtype).at[dest].add(ps)
    cnts = jnp.zeros((capacity + 1,), jnp.int32).at[dest].add(1)
    lab = jnp.full((capacity + 1,), -1, jnp.int32).at[dest].max(ls)
    out = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1)
    out_mask = cnts[:capacity] > 0
    return out, lab[:capacity], out_mask


@functools.partial(jax.jit, static_argnames=("leaf", "capacity", "anchor"))
def voxel_merge_aged(
    new_points: jnp.ndarray,  # (A, 3) current keyframe cloud (world frame)
    new_mask: jnp.ndarray,  # (A,)
    map_points: jnp.ndarray,  # (C, 3) existing map buffer
    map_age: jnp.ndarray,  # (C,) int32 keyframe index of last observation
    map_mask: jnp.ndarray,  # (C,)
    kf_index: jnp.ndarray,  # () int32 current keyframe counter
    window: int,
    leaf: float,
    capacity: int,
    new_flag: jnp.ndarray | None = None,  # (A,) optional bool payload
    map_flag: jnp.ndarray | None = None,  # (C,)
    anchor: str = "first",  # "first" | "newest" (VoxelConfig.map_anchor)
):
    """Incremental sliding-window map update, one sort + unique scatters.

    Window semantics match the reference's merge-last-K-keyframes +
    voxel-downsample rebuild (odomEstimationNode.cpp:185-207): a voxel is in
    the map iff some keyframe in the last `window` observed it. Points carry
    the keyframe index of their last observation; expired points are masked
    out, the new cloud is concatenated with the map and one sort-dedup
    produces the new fixed-capacity buffer.

    `anchor` selects what a re-observed voxel keeps (only the age refreshes
    either way):
      - "first" (default): the FIRST observation's position is anchored
        (insert-into-empty-voxel semantics, the standard accelerator
        voxel-map rule, e.g. KISS-ICP/VDB). Round 2 kept the newest
        position, which lets a drifting pose estimate smear previously
        anchored geometry — first-anchoring measured sharp-mode ATE
        0.144 -> 0.027 and full_ds 0.136 -> 0.041 on the clean 12-scan
        HDL-64 circuit (docs/PERF.md round 3).
      - "newest": re-observation replaces the stored position (closer to
        the reference's per-frame rebuild from keyframe clouds +
        PCL-voxel centroids, odomEstimationNode.cpp:185-207). Wins when
        individual observations carry residual error that re-observation
        should wash out — e.g. the velocity-deskew alternate front-end on
        heavily motion-distorted scans (tests/test_lio.py), where "first"
        permanently anchors the distortion of whichever scan saw a voxel
        first and diverges (ATE 0.25 -> 2.5 on that circuit).
    Implementation: map points sort after new points (larger row index at
    equal key) and the map holds <= 1 point per voxel, so within a key run
    the LAST element is the anchored map point when one exists ("first")
    and the FIRST element is the newest observation ("newest" + age).

    With `new_flag`/`map_flag`, a per-point boolean payload rides the same
    sorting network and follows its POINT (e.g. the dynamic-class flag of
    the semantic local map — folding the reference's separate dynamic-class
    cloud into the surf map buffer saves a whole second merge per keyframe).

    Returns (points (C,3), age (C,), mask (C,)[, flag (C,)]).
    """
    with_flag = new_flag is not None
    alive = map_mask & (map_age > kf_index - window)
    pts = jnp.concatenate([new_points, map_points], axis=0)
    age = jnp.concatenate(
        [jnp.full(new_points.shape[0], kf_index, jnp.int32), map_age]
    )
    mask = jnp.concatenate([new_mask, alive])
    # morton key: dedup AND leave the output spatially (Z-order) sorted for
    # the Pallas kNN kernel's tile-skipping search.
    # Payload rides INSIDE both sorting networks (multi-operand lax.sort):
    # argsort + random gathers cost 3-6 ms per 100k rows on this TPU.
    # Stability requirement ("first occurrence per voxel wins", with the new
    # cloud concatenated in front) is met by a second lexicographic key (the
    # row index) instead of a stable sort (x64 is disabled, so the index
    # cannot be packed into a 64-bit key).
    n = pts.shape[0]
    h = jnp.where(mask, _voxel_key_morton(pts, mask, leaf), _SENTINEL)
    iota = jnp.arange(n, dtype=jnp.int32)
    cols = (h, iota, pts[:, 0], pts[:, 1], pts[:, 2], age)
    if with_flag:
        flag = jnp.concatenate(
            [new_flag.astype(jnp.int32), map_flag.astype(jnp.int32)])
        cols = cols + (flag,)
    s = jax.lax.sort(cols, num_keys=2)
    hs = s[0]
    diff_prev = jnp.concatenate([jnp.ones(1, bool), hs[1:] != hs[:-1]])
    diff_next = jnp.concatenate([hs[1:] != hs[:-1], jnp.ones(1, bool)])
    valid = hs != _SENTINEL
    is_first = diff_prev & valid  # run start: newest observation (age)
    is_last = diff_next & valid  # run end: anchored position (+ its flag)
    # compaction via TWO unique-monotonic-index scatters instead of a
    # second full sort (same rewrite as ops/projection.py / the downsample
    # above): dest is non-decreasing over sorted positions
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    if anchor not in ("first", "newest"):
        raise ValueError(f"anchor must be 'first'|'newest', got {anchor!r}")
    is_anchor = is_last if anchor == "first" else is_first
    dest_pos = jnp.where(is_anchor & (seg < capacity), seg, capacity)
    dest_age = jnp.where(is_first & (seg < capacity), seg, capacity)
    k = jnp.minimum(jnp.sum(is_first.astype(jnp.int32)), capacity)
    out_mask = jnp.arange(capacity) < k
    rows = jnp.stack(  # cols layout: (h, iota, x, y, z, age[, flag])
        s[2:5] + ((s[6].astype(s[2].dtype),) if with_flag else ()), axis=1)
    buf = jnp.zeros((capacity + 1, rows.shape[1]), rows.dtype)
    buf = buf.at[dest_pos].set(rows)[:capacity]
    out_pts = jnp.where(out_mask[:, None], buf[:, :3], 0.0)
    out_age = jnp.zeros((capacity + 1,), jnp.int32).at[dest_age].set(
        s[5])[:capacity]
    out_age = jnp.where(out_mask, out_age, -(10**9))
    if with_flag:
        return out_pts, out_age, out_mask, (buf[:, 3] > 0) & out_mask
    return out_pts, out_age, out_mask


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_masked(points: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """Pack masked rows of (N, 3) into a (capacity, 3) buffer (order kept)."""
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (pos < capacity), pos, capacity)
    buf = jnp.zeros((capacity + 1, 3), points.dtype).at[dest].set(points)
    cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
    return buf[:capacity], jnp.arange(capacity) < cnt
